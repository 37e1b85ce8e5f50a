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
