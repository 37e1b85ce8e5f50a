"""Baseline JPEG codec tests (K6): marker structure, decode
round-trip tolerance, determinism, and the png8 palette bound fix
(round-2 VERDICT item 6 / ADVICE renderers.py findings)."""

import struct

import numpy as np
import pytest

from gdal2mbtiles_spark.jpeg import (ZIGZAG, decode_jpeg_rgb,
                                     encode_jpeg_rgb,
                                     scaled_quant_tables)
from gdal2mbtiles_spark.renderers import (JpegRenderer, decode_png_rgba,
                                          encode_png8)


def smooth(h=64, w=48):
    gx = np.linspace(0, 255, w)[None, :].repeat(h, 0)
    gy = np.linspace(0, 255, h)[:, None].repeat(w, 1)
    return np.stack([gx, gy, (gx + gy) / 2], -1).astype(np.uint8)


def markers(data):
    """Top-level marker sequence of a JPEG byte stream."""
    out, pos = [], 0
    while pos < len(data) - 1:
        assert data[pos] == 0xFF
        m = data[pos + 1]
        out.append(m)
        if m in (0xD8, 0xD9):
            pos += 2
        else:
            (ln,) = struct.unpack(">H", data[pos + 2:pos + 4])
            pos += 2 + ln
        if m == 0xDA:          # entropy-coded data follows SOS
            break
    return out


def test_marker_structure():
    data = encode_jpeg_rgb(smooth(), quality=85)
    ms = markers(data)
    # SOI, APP0, DQT x2, SOF0, DHT x4, SOS
    assert ms == [0xD8, 0xE0, 0xDB, 0xDB, 0xC0,
                  0xC4, 0xC4, 0xC4, 0xC4, 0xDA]
    assert data[-2:] == b"\xff\xd9"
    # SOF0 carries the true (unpadded) dimensions
    sof = data.index(b"\xff\xc0")
    h, w = struct.unpack(">HH", data[sof + 5:sof + 9])
    assert (h, w) == (64, 48)


def test_round_trip_tolerance():
    img = smooth()
    dec = decode_jpeg_rgb(encode_jpeg_rgb(img, quality=90))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() <= 25


def test_round_trip_noise_symbol_coverage():
    # random noise exercises the full (run, size) AC symbol space
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    dec = decode_jpeg_rgb(encode_jpeg_rgb(img, quality=95))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 10.0


def test_odd_dimensions_padded():
    img = smooth()[:33, :41]
    dec = decode_jpeg_rgb(encode_jpeg_rgb(img, 85))
    assert dec.shape == img.shape


def test_deterministic_and_quality_monotone():
    img = smooth()
    a = encode_jpeg_rgb(img, 85)
    assert a == encode_jpeg_rgb(img, 85)
    assert len(encode_jpeg_rgb(img, 95)) > len(encode_jpeg_rgb(img, 30))


def test_quality_scaling_bounds():
    for q in (1, 25, 50, 85, 100):
        ql, qc = scaled_quant_tables(q)
        assert ql.min() >= 1 and ql.max() <= 255
        assert qc.min() >= 1 and qc.max() <= 255
    assert scaled_quant_tables(100)[0].max() == 1  # lossless-est tables


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_renderer_emits_decodable_jpeg():
    rgba = np.zeros((256, 256, 4), dtype=np.uint8)
    rgba[..., 0] = np.linspace(0, 255, 256)[None, :]
    rgba[..., 3] = 255
    out = JpegRenderer(quality=90).render(rgba.tobytes())
    dec = decode_jpeg_rgb(out)
    err = np.abs(dec[..., 0].astype(int)
                 - rgba[..., 0].astype(int))
    assert dec.shape == (256, 256, 3)
    assert err.mean() < 3.0


def test_png8_honors_small_palette_bound():
    # ADVICE renderers.py:100 — png8=2 used to emit up to 16 colors
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    for max_colors in (2, 3, 4, 15, 16):
        png = encode_png8(img.tobytes(), width=16, height=16,
                          max_colors=max_colors)
        plte = png.index(b"PLTE")
        (ln,) = struct.unpack(">I", png[plte - 4:plte])
        assert ln // 3 <= max_colors, (max_colors, ln // 3)


def test_png8_palette_sorted_by_rgba():
    img = np.zeros((4, 4, 4), dtype=np.uint8)
    img[0] = (200, 0, 0, 255)
    img[1] = (0, 200, 0, 255)
    img[2] = (0, 0, 200, 255)
    img[3] = (0, 0, 200, 10)
    png = encode_png8(img.tobytes(), width=4, height=4)
    plte = png.index(b"PLTE") + 4
    pal = np.frombuffer(png[plte:plte + 12], np.uint8).reshape(-1, 3)
    # lexicographic (R, G, B, A): alpha variant of blue sorts first
    assert pal.tolist() == [[0, 0, 200], [0, 0, 200],
                            [0, 200, 0], [200, 0, 0]]
    # round-trip through our decoder preserves pixels
    assert np.array_equal(decode_png_rgba(png), img)


def test_420_marker_structure_and_sampling():
    data = encode_jpeg_rgb(smooth(), quality=85, subsampling="420")
    ms = markers(data)
    assert ms == [0xD8, 0xE0, 0xDB, 0xDB, 0xC0,
                  0xC4, 0xC4, 0xC4, 0xC4, 0xDA]
    sof = data.index(b"\xff\xc0")
    h, w = struct.unpack(">HH", data[sof + 5:sof + 9])
    assert (h, w) == (64, 48)
    # component 1 declares 2x2 sampling, chroma 1x1
    assert data[sof + 11] == 0x22
    assert data[sof + 14] == 0x11 and data[sof + 17] == 0x11


def test_420_round_trip_tolerance():
    img = smooth()
    dec = decode_jpeg_rgb(encode_jpeg_rgb(img, quality=90,
                                          subsampling="420"))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 4.0 and err.max() <= 40


def test_420_flat_color_exact():
    # a flat image survives 4:2:0 exactly: DC-only blocks, box
    # average is the identity on constants
    img = np.full((32, 32, 3), 200, np.uint8)
    dec = decode_jpeg_rgb(encode_jpeg_rgb(img, quality=90,
                                          subsampling="420"))
    assert int(np.abs(dec.astype(int) - 200).max()) <= 1


def test_420_luma_detail_survives_chroma_subsampling():
    # a luma-only checkerboard has zero chroma: 4:2:0 must keep the
    # full-resolution Y detail (catches any Y-block MCU-order bug)
    yy, xx = np.mgrid[0:32, 0:32]
    v = ((xx + yy) % 2 * 255).astype(np.uint8)
    img = np.stack([v, v, v], -1)
    dec = decode_jpeg_rgb(encode_jpeg_rgb(img, 95, subsampling="420"))
    got = dec.astype(int).mean(axis=2)
    # the checkerboard's phase must survive (high-frequency luma)
    dark = got[(xx + yy) % 2 == 0].mean()
    lit = got[(xx + yy) % 2 == 1].mean()
    assert lit - dark > 100


def test_420_odd_dimensions():
    img = smooth()[:33, :41]
    dec = decode_jpeg_rgb(encode_jpeg_rgb(img, 85, subsampling="420"))
    assert dec.shape == img.shape


def test_420_deterministic_and_smaller():
    img = smooth()
    a = encode_jpeg_rgb(img, 85, subsampling="420")
    assert a == encode_jpeg_rgb(img, 85, subsampling="420")
    # half the chroma blocks: 4:2:0 must not be larger on a smooth img
    assert len(a) <= len(encode_jpeg_rgb(img, 85))


def test_444_unchanged_by_420_support():
    # regression: the 4:4:4 byte stream must be bit-identical to the
    # pre-420 encoder (tile dedup hashes depend on it)
    img = smooth()
    dec = decode_jpeg_rgb(encode_jpeg_rgb(img, quality=90))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 3.0


# --- progressive (SOF2, T.81 Annex G) — round 5 -------------------------------

class TestProgressive:
    def test_sof2_marker_and_scan_count(self):
        data = encode_jpeg_rgb(smooth(), 85, progressive=True)
        assert b"\xff\xc2" in data and b"\xff\xc0" not in data
        # the conventional 10-scan YCbCr script
        assert data.count(b"\xff\xda") >= 10

    @pytest.mark.parametrize("sub", ["444", "420"])
    @pytest.mark.parametrize("shape", [(64, 64), (48, 40), (37, 53),
                                       (16, 16), (8, 8), (9, 17)])
    def test_pixels_identical_to_baseline(self, sub, shape):
        # progressive reorders the SAME quantized coefficients, so
        # decode must be bit-identical to the baseline file's decode
        # (this is an exact oracle, not a tolerance)
        rng = np.random.default_rng(hash(shape) % 2**32)
        img = rng.integers(0, 255, size=(*shape, 3), dtype=np.uint8)
        base = decode_jpeg_rgb(encode_jpeg_rgb(img, 85, sub))
        prog = decode_jpeg_rgb(
            encode_jpeg_rgb(img, 85, sub, progressive=True))
        assert np.array_equal(base, prog)

    def test_noise_stresses_zrl_and_refinement(self):
        # dense high-frequency content exercises ZRL-in-refinement
        # and correction-bit buffering across long runs
        rng = np.random.default_rng(9)
        img = rng.integers(0, 255, size=(96, 104, 3), dtype=np.uint8)
        for q in (30, 85, 95):
            a = decode_jpeg_rgb(encode_jpeg_rgb(img, q, "420"))
            b = decode_jpeg_rgb(
                encode_jpeg_rgb(img, q, "420", progressive=True))
            assert np.array_equal(a, b)

    def test_flat_image_long_eob_runs(self):
        # an all-flat image makes every AC band empty: the encoder
        # must fold 256 luma blocks into EOBn runs (run > 1 requires
        # the EOBn symbols absent from the Annex-K baseline tables)
        img = np.full((128, 128, 3), 77, np.uint8)
        data = encode_jpeg_rgb(img, 85, "420", progressive=True)
        a = decode_jpeg_rgb(encode_jpeg_rgb(img, 85, "420"))
        assert np.array_equal(decode_jpeg_rgb(data), a)
        # and the progressive file is not absurdly large
        assert len(data) < 4 * len(encode_jpeg_rgb(img, 85, "420"))

    def test_deterministic(self):
        img = smooth(80, 72)
        a = encode_jpeg_rgb(img, 85, "420", progressive=True)
        b = encode_jpeg_rgb(img, 85, "420", progressive=True)
        assert a == b


class TestRestartIntervals:
    """DRI/RSTn (round 5): restart markers change only the entropy
    framing, never the quantized coefficients, so a DRI file must
    decode BIT-IDENTICAL to its plain twin — the same exactness
    oracle the progressive suite uses (no system libjpeg here)."""

    def _noise(self, h, w, seed=7):
        return (np.random.default_rng(seed)
                .integers(0, 256, (h, w, 3)).astype(np.uint8))

    @pytest.mark.parametrize("sub", ["444", "420"])
    @pytest.mark.parametrize("ri", [1, 3, 8])
    def test_baseline_dri_exact(self, sub, ri):
        img = smooth(64, 80)
        plain = decode_jpeg_rgb(encode_jpeg_rgb(img, 85, sub))
        data = encode_jpeg_rgb(img, 85, sub, restart_interval=ri)
        assert b"\xff\xdd" in data
        assert any(bytes([0xFF, 0xD0 + k]) in data for k in range(8))
        assert np.array_equal(decode_jpeg_rgb(data), plain)

    @pytest.mark.parametrize("sub", ["444", "420"])
    @pytest.mark.parametrize("ri", [2, 5])
    def test_progressive_dri_exact(self, sub, ri):
        # noise stresses EOB-run flushes at restart boundaries in the
        # AC refinement scans (memory: ZRL-in-refinement territory)
        img = self._noise(48, 64)
        plain = decode_jpeg_rgb(encode_jpeg_rgb(img, 85, sub))
        data = encode_jpeg_rgb(img, 85, sub, progressive=True,
                               restart_interval=ri)
        assert np.array_equal(decode_jpeg_rgb(data), plain)

    def test_flat_progressive_dri_eob_run_reset(self):
        # flat image: every AC band is one long EOB run; ri forces it
        # to flush and restart at every marker in every AC scan
        img = np.full((64, 96, 3), 130, np.uint8)
        plain = decode_jpeg_rgb(encode_jpeg_rgb(img, 85, "420"))
        data = encode_jpeg_rgb(img, 85, "420", progressive=True,
                               restart_interval=2)
        assert np.array_equal(decode_jpeg_rgb(data), plain)

    def test_marker_numbering_wraps_mod8(self):
        # > 8 restarts in one scan: RSTn cycles D0..D7
        img = smooth(8, 8 * 20)       # 20 MCUs at 4:4:4
        data = encode_jpeg_rgb(img, 85, "444", restart_interval=1)
        seen = []
        i = data.index(b"\xff\xda")
        while True:
            j = data.find(b"\xff", i + 2)
            if j < 0 or j + 1 >= len(data):
                break
            m = data[j + 1]
            if 0xD0 <= m <= 0xD7:
                seen.append(m - 0xD0)
            i = j
        assert len(seen) == 19
        assert seen == [k % 8 for k in range(19)]

    def test_dri_non_multiple_tail(self):
        # MCU count not a multiple of ri: trailing partial interval
        img = smooth(40, 56)          # 5x7 = 35 MCUs, ri=4 -> tail 3
        plain = decode_jpeg_rgb(encode_jpeg_rgb(img, 85, "444"))
        data = encode_jpeg_rgb(img, 85, "444", restart_interval=4)
        assert np.array_equal(decode_jpeg_rgb(data), plain)

    def test_multimodal_validator_accepts_dri(self):
        from gdal2mbtiles_spark.operators.multimodal import (
            _is_supported_jpeg)
        img = smooth(32, 32)
        data = encode_jpeg_rgb(img, 85, "420", restart_interval=2)
        assert _is_supported_jpeg(data)
        prog = encode_jpeg_rgb(img, 85, "420", progressive=True,
                               restart_interval=2)
        assert _is_supported_jpeg(prog)
