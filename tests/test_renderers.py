"""Renderer tests: deterministic PNG encode/decode round-trip, JPEG
alpha-strip (reference tests/test_renderers.py:40-55 semantics), Touch
null renderer."""

import numpy as np
import pytest

from gdal2mbtiles_spark.renderers import (
    JpegRenderer, PngRenderer, TouchRenderer, decode_png_rgba,
    encode_png_rgba)


def checker(side=256):
    a = np.zeros((side, side, 4), dtype=np.uint8)
    a[::2, ::2] = (255, 0, 0, 255)
    a[1::2, 1::2] = (0, 255, 0, 128)
    return a


def test_png_round_trip():
    arr = checker()
    png = encode_png_rgba(arr.tobytes())
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    back = decode_png_rgba(png)
    assert np.array_equal(back, arr)


def test_png_deterministic():
    arr = checker()
    assert (encode_png_rgba(arr.tobytes())
            == encode_png_rgba(arr.tobytes()))


def test_png_compression_levels():
    raw = checker().tobytes()
    sizes = {lvl: len(encode_png_rgba(raw, compression=lvl))
             for lvl in (0, 1, 9)}
    assert sizes[0] > sizes[1] >= sizes[9]


def test_png_interlace_differs_but_same_signature():
    raw = checker().tobytes()
    plain = encode_png_rgba(raw, interlace=False)
    inter = encode_png_rgba(raw, interlace=True)
    assert plain != inter
    assert inter[:8] == b"\x89PNG\r\n\x1a\n"


def test_png_bad_buffer():
    with pytest.raises(ValueError):
        encode_png_rgba(b"123")


def test_png_renderer_validates_compression():
    with pytest.raises(ValueError):
        PngRenderer(compression=10)


def test_jpeg_strips_alpha():
    # reference renderers.py:89-91: bands > 3 keep the first 3
    arr = checker()
    r = JpegRenderer()
    rgb = np.frombuffer(r.strip_alpha(arr.tobytes()),
                        dtype=np.uint8).reshape(256, 256, 3)
    assert np.array_equal(rgb, arr[:, :, :3])
    out = r.render(arr.tobytes())
    assert out[:4] == b"\xff\xd8\xff\xe0" and out[-2:] == b"\xff\xd9"


def test_jpeg_quality_range():
    with pytest.raises(ValueError):
        JpegRenderer(quality=101)


def test_touch_renderer_empty():
    # reference renderers.py:191-197
    assert TouchRenderer().render(checker().tobytes()) == b""


class TestStitchedSparsePng:
    """Round-5 sparse fast path: mostly-blank tiles stitch
    pre-compressed blank-row deflate segments (Z_FULL_FLUSH
    boundaries + arithmetic adler32) instead of scanning 256 KB of
    zeros through zlib.  zlib.decompress VERIFIES the adler trailer,
    so every decode below also proves the stitched checksum."""

    def _decode(self, png):
        from gdal2mbtiles_spark.renderers import decode_png_rgba
        return decode_png_rgba(png)

    def _enc(self, img, level=1):
        from gdal2mbtiles_spark.renderers import encode_png_rgba
        h, w = img.shape[:2]
        return encode_png_rgba(img.tobytes(), width=w, height=h,
                               compression=level)

    @pytest.mark.parametrize("level", [1, 6, 9])
    def test_pixel_exact_on_sparse_patterns(self, level):
        rng = np.random.default_rng(0)
        imgs = []
        imgs.append(np.zeros((256, 256, 4), np.uint8))      # blank
        t = np.zeros((256, 256, 4), np.uint8)
        ij = rng.integers(0, 256, (12, 2))
        t[ij[:, 0], ij[:, 1]] = [255, 10, 10, 255]
        imgs.append(t)                                      # isolated px
        t = np.zeros((256, 256, 4), np.uint8)
        t[0] = [1, 2, 3, 4]
        imgs.append(t)                                      # first row
        t = np.zeros((256, 256, 4), np.uint8)
        t[255] = [9, 8, 7, 6]
        imgs.append(t)                                      # last row
        t = np.zeros((256, 256, 4), np.uint8)
        t[10:14] = rng.integers(0, 256, (4, 256, 4))
        imgs.append(t)                                      # lit run
        for img in imgs:
            assert np.array_equal(self._decode(self._enc(img, level)),
                                  img)

    def test_threshold_boundary_and_dense(self):
        # exactly at/over the lit-row threshold and fully dense tiles
        # must still decode exactly (monolithic path)
        from gdal2mbtiles_spark.renderers import _STITCH_MAX_LIT
        rng = np.random.default_rng(1)
        at = np.zeros((256, 256, 4), np.uint8)
        at[:_STITCH_MAX_LIT] = 7
        over = np.zeros((256, 256, 4), np.uint8)
        over[:_STITCH_MAX_LIT + 1] = 7
        dense = rng.integers(0, 256, (256, 256, 4)).astype(np.uint8)
        for img in (at, over, dense):
            assert np.array_equal(self._decode(self._enc(img)), img)

    def test_content_determined_bytes(self):
        # the path is selected on content only: the same pixels give
        # the same bytes no matter how many times / where encoded —
        # the sparse-vs-buffered plan bit-identity contract
        t = np.zeros((256, 256, 4), np.uint8)
        t[100, 100] = [1, 2, 3, 255]
        assert self._enc(t) == self._enc(t.copy())

    def test_compression_zero_stays_stored(self):
        # level 0 must keep the plain stored-block encoding
        t = np.zeros((16, 16, 4), np.uint8)
        t[3, 3] = 9
        png = self._enc(t, level=0)
        assert np.array_equal(self._decode(png), t)

    def test_non_square_and_odd_dims(self):
        t = np.zeros((64, 32, 4), np.uint8)
        t[5, 7] = 200
        assert np.array_equal(self._decode(self._enc(t)), t)
        t = np.zeros((33, 41, 4), np.uint8)
        t[32, 40] = 128
        assert np.array_equal(self._decode(self._enc(t)), t)

    def test_strict_zlib_stream(self):
        # the stitched IDAT must be one conformant zlib member with a
        # correct adler32: decompressobj flags trailing garbage or a
        # bad checksum
        import struct
        import zlib as _z
        t = np.zeros((256, 256, 4), np.uint8)
        t[17, 200] = [4, 4, 4, 40]
        png = self._enc(t)
        pos, idat = 8, b""
        while pos < len(png):
            (ln,) = struct.unpack(">I", png[pos:pos + 4])
            if png[pos + 4:pos + 8] == b"IDAT":
                idat += png[pos + 8:pos + 8 + ln]
            pos += 12 + ln
        do = _z.decompressobj()
        raw = do.decompress(idat)
        do.flush()
        assert do.unused_data == b"" and do.eof
        assert len(raw) == 256 * (256 * 4 + 1)
