"""Color compiler goldens — clause/expression strings transcribed from
the reference suite (tests/test_vips.py:373-910), plus kernel
evaluation checks."""

import numpy as np
import pytest

from gdal2mbtiles_spark.colors import (ColorExact, ColorGradient,
                                       ColorPalette, rgba)

TRANSPARENT = rgba(0, 0, 0, 0)
BLACK = rgba(0, 0, 0, 255)
RED = rgba(255, 0, 0, 255)
GREEN = rgba(0, 255, 0, 255)


class TestRgba:
    def test_webcolor(self):
        assert rgba.webcolor("#f00") == (255, 0, 0, 255)
        assert rgba.webcolor("#00ff00") == (0, 255, 0, 255)
        assert rgba.webcolor("red") == (255, 0, 0, 255)
        with pytest.raises(ValueError):
            rgba.webcolor("notacolor")

    def test_default_alpha(self):
        assert rgba(1, 2, 3) == (1, 2, 3, 255)


class TestExact:
    # tests/test_vips.py:383-470
    def test_empty(self):
        colors = ColorExact()
        assert colors._clauses(band="r") == []
        assert colors._expression(band="r") is None
        assert colors._clauses(band="a", nodata=0) == []

    def test_one_color(self):
        colors = ColorExact({0: RED})
        assert colors._clauses(band="r") == [("n == 0", 255)]
        assert colors._clauses(band="a") == [("n == 0", 255)]
        assert colors._expression(band="r") == "where(n == 0, 255, 0)"

    def test_two_colors_and_nodata(self):
        colors = ColorExact({0: RED, 2: GREEN})
        assert colors._clauses(band="a") == [("n == 0", 255),
                                             ("n == 2", 255)]
        assert (colors._expression(band="a")
                == "where(n == 2, 255, where(n == 0, 255, 0))")
        # nodata=2 removes the green clause
        assert colors._clauses(band="r", nodata=2) == [("n == 0", 255)]


class TestPalette:
    def test_lstrip_and_nodata(self):
        colors = ColorPalette({0: RED, 2: GREEN})
        # band g: red.g == background -> lstripped
        assert colors._clauses(band="g") == [("n >= 2", 255)]
        # alpha: both 255, deduplicated to the first
        assert colors._clauses(band="a") == [("n >= 0", 255)]
        # nodata >= first stop appends the transparent alpha clause
        assert colors._clauses(band="a", nodata=5) == [
            ("n >= 0", 255), ("n == 5", 0)]


class TestGradient:
    def test_reference_golden_slopes(self):
        # tests/test_vips.py:880-903: {0: red, 64: dark_red, 255: black}
        dark_red = rgba(127, 0, 0, 255)
        colors = ColorGradient({0: RED, 64: dark_red, 255: BLACK})
        assert colors._clauses(band="r") == [
            ("n >= 0", "-0.5 * n + 255.0"),
            ("n >= 64", "-1.5039370078740157 * n + 223.251968503937"),
            ("n >= 255", 0),
        ]
        assert colors._clauses(band="g") == []
        assert colors._clauses(band="a") == [("n >= 0", 255)]
        assert colors._expression(band="r") == (
            "where(n >= 255, 0, "
            "where(n >= 64, -1.5039370078740157 * n + 223.251968503937, "
            "where(n >= 0, -0.5 * n + 255.0, 0)))")


class TestKernels:
    def test_exact_kernel(self):
        colors = ColorExact({0: RED, 2: GREEN})
        k = colors.rgba_kernel()
        out = k(np.array([0, 1, 2, 3], dtype=np.float32))
        assert out.tolist() == [[255, 0, 0, 255], [0, 0, 0, 0],
                                [0, 255, 0, 255], [0, 0, 0, 0]]

    def test_palette_kernel_with_nodata(self):
        colors = ColorPalette({0: RED, 2: GREEN})
        k = colors.rgba_kernel(nodata=5)
        out = k(np.array([-1, 0, 1, 2, 5], dtype=np.float32))
        assert out[:, 3].tolist() == [0, 255, 255, 255, 0]  # nodata->0
        assert out[1].tolist() == [255, 0, 0, 255]
        assert out[3].tolist() == [0, 255, 0, 255]

    def test_gradient_kernel_matches_expression(self):
        dark_red = rgba(127, 0, 0, 255)
        colors = ColorGradient({0: RED, 64: dark_red, 255: BLACK})
        k = colors.band_kernel("r")
        n = np.array([0.0, 32.0, 64.0, 255.0])
        out = k(n)
        # evaluates the same nested where-chain
        assert out[0] == np.uint8(-0.5 * 0 + 255.0)
        assert out[1] == np.uint8(-0.5 * 32 + 255.0)
        assert out[2] == np.uint8(-1.5039370078740157 * 64
                                  + 223.251968503937)
        assert out[3] == 0


class TestColorizeTiles(object):
    def test_single_band_to_rgba(self, spark):
        # 256x256 float32 tile of {0,1,2,10}; nodata=10 -> transparent
        vals = np.zeros((256, 256), dtype=np.float32)
        vals[:, 64:128] = 1.0
        vals[:, 128:192] = 2.0
        vals[:, 192:] = 10.0
        df = spark.createDataFrame(
            [(0, 0, 0, bytearray(vals.tobytes()))],
            "z int, x bigint, y bigint, px binary")
        from gdal2mbtiles_spark.colors import colorize_tiles
        colors = ColorPalette({0: RED, 2: GREEN})
        out = colorize_tiles(df, colors, dtype="float32",
                             nodata=10.0).collect()
        arr = np.frombuffer(bytes(out[0]["px"]), np.uint8).reshape(
            256, 256, 4)
        assert arr[0, 0].tolist() == [255, 0, 0, 255]    # 0 -> red
        assert arr[0, 100].tolist() == [255, 0, 0, 255]  # 1 -> still red
        assert arr[0, 150].tolist() == [0, 255, 0, 255]  # 2 -> green
        assert arr[0, 200].tolist() == [0, 255, 0, 0]    # nodata: a=0
