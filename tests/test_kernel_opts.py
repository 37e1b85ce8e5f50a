"""Round-6 kernel-optimization contracts.

The phase kernel's md5 now resumes from cached zero-prefix states and
the stitched PNG encoder groups lit rows in plain python; both must be
BIT-IDENTICAL to the naive forms (the A1 hash contract and the
sparse==buffered byte contract depend on it).
"""

import hashlib

import numpy as np
import pandas as pd
import pytest

from gdal2mbtiles_spark.operators.sparse import (_md5_sparse,
                                                 _pixel_chunk,
                                                 _tile_chunk)
from gdal2mbtiles_spark.renderers import decode_png_rgba, encode_png_rgba


def _random_canvas(rng, max_lit_rows=60):
    arr = np.zeros((256, 256, 4), np.uint8)
    nlit = rng.randint(0, max_lit_rows)
    rows = rng.choice(256, size=nlit, replace=True)
    for r in rows:
        cols = rng.choice(256, size=rng.randint(1, 4), replace=True)
        arr[r, cols] = rng.randint(0, 256, size=(len(cols), 4),
                                   dtype=np.uint8)
    return arr, np.sort(rows.astype(np.uint8))


class TestMd5ZeroPrefix:
    def test_digest_identity_randomized(self):
        rng = np.random.RandomState(7)
        for _ in range(100):
            arr, rows = _random_canvas(rng)
            raw = arr.reshape(-1).data
            first = int(rows[0]) if len(rows) else 0
            assert (_md5_sparse(raw, first).hexdigest()
                    == hashlib.md5(raw).hexdigest())

    def test_boundary_rows(self):
        for first_content_row in (0, 1, 254, 255):
            arr = np.zeros((256, 256, 4), np.uint8)
            arr[first_content_row, 3] = (9, 8, 7, 6)
            raw = arr.reshape(-1).data
            assert (_md5_sparse(raw, first_content_row).hexdigest()
                    == hashlib.md5(raw).hexdigest())

    def test_all_zero_canvas(self):
        raw = np.zeros(256 * 256 * 4, np.uint8).data
        for first in (0, 128, 256):
            assert (_md5_sparse(raw, first).hexdigest()
                    == hashlib.md5(raw).hexdigest())


class TestStitchedHintedEncode:
    def test_hinted_equals_unhinted_with_duplicate_hints(self):
        """The kernel now passes the SORTED, possibly-duplicated lit
        pixel rows as lit_hint (it no longer np.unique's them); the
        emitted bytes must equal the unhinted encode."""
        rng = np.random.RandomState(21)
        for _ in range(60):
            arr, rows = _random_canvas(rng)
            raw = bytes(arr.reshape(-1))
            hinted = encode_png_rgba(raw, compression=1, lit_hint=rows)
            plain = encode_png_rgba(raw, compression=1)
            assert hinted == plain
            assert np.array_equal(decode_png_rgba(hinted), arr)

    def test_consecutive_and_gap_row_groups(self):
        """Exercise the rewritten group loop: runs of consecutive lit
        rows, gaps, and edge rows."""
        for lit in ([0], [255], [0, 1, 2], [10, 11, 30], [0, 255],
                    list(range(40)), [5, 5, 6, 9]):
            arr = np.zeros((256, 256, 4), np.uint8)
            for r in lit:
                arr[r, r] = (1, 2, 3, 4)
            raw = bytes(arr.reshape(-1))
            hint = np.asarray(sorted(lit), np.uint8)
            hinted = encode_png_rgba(raw, compression=1, lit_hint=hint)
            plain = encode_png_rgba(raw, compression=1)
            assert hinted == plain
            assert np.array_equal(decode_png_rgba(hinted), arr)


class TestPhaseChunks:
    def test_tile_chunk_columns(self):
        c = _tile_chunk([4, 4], [1, 2], [3, 4], [-5, 6],
                        ["aa", "bb"], [b"x", b"y"])
        assert list(c.columns) == ["kind", "z", "x", "y", "tile_id",
                                   "tile_hex", "tile_data", "gx", "gy",
                                   "r", "g", "b", "a"]
        assert (c["kind"] == 0).all()
        assert c["gx"].isna().all() and c["a"].isna().all()
        assert c["tile_id"].tolist() == [-5, 6]

    def test_pixel_chunk_columns(self):
        gx = np.array([7, 8], np.int64)
        gy = np.array([9, 10], np.int64)
        ch = [np.array([1, 2], np.int64) for _ in range(4)]
        c = _pixel_chunk(gx, gy, ch)
        assert (c["kind"] == 1).all()
        assert c["z"].isna().all() and c["tile_id"].isna().all()
        assert c["tile_hex"].isna().all()
        assert c["gx"].tolist() == [7, 8]
        assert c["r"].tolist() == [1, 2]
