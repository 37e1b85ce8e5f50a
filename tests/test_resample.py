"""Resample/align tests — size goldens and pixel semantics from the
reference suite (tests/test_vips.py:41-275)."""

import numpy as np
import pytest

from gdal2mbtiles_spark.grid import (RasterMeta, SRS_MERCATOR,
                                     whole_world_raster_meta)
from gdal2mbtiles_spark.operators.resample import (
    align_to_grid_blocks, blocks_from_array, blocks_to_array,
    blocks_to_tiles, resample_blocks, scale_blocks)

CIRC = SRS_MERCATOR.major_circumference()
HALF = CIRC / 2


def gradient_img(w, h):
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.empty((h, w, 4), dtype=np.uint8)
    img[..., 0] = gx % 256
    img[..., 1] = gy % 256
    img[..., 2] = 7
    img[..., 3] = 255
    return img


class TestScaleBlocks:
    def test_upsample_2x_matches_repeat(self, spark):
        img = gradient_img(300, 200)
        blocks = blocks_from_array(spark, img)
        out, w, h = scale_blocks(blocks, 300, 200, 2.0, 2.0,
                                 interpolate="near")
        assert (w, h) == (600, 400)
        got = blocks_to_array(out, w, h)
        want = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
        assert np.array_equal(got, want)

    def test_shrink_half_matches_box(self, spark):
        img = gradient_img(512, 512)
        blocks = blocks_from_array(spark, img)
        out, w, h = scale_blocks(blocks, 512, 512, 0.5, 0.5,
                                 interpolate="bilinear")
        assert (w, h) == (256, 256)
        got = blocks_to_array(out, w, h)
        s = img.astype(np.uint16)
        total = (s[0::2, 0::2] + s[1::2, 0::2] + s[0::2, 1::2]
                 + s[1::2, 1::2])
        want = ((total + 2) >> 2).astype(np.uint8)
        assert np.array_equal(got, want)

    def test_seams_equal_whole_image(self, spark):
        # non-integer shrink crossing block boundaries: distributed
        # result must equal the single-array computation (halo rule)
        img = gradient_img(512, 384)
        blocks = blocks_from_array(spark, img)
        out, w, h = scale_blocks(blocks, 512, 384, 0.75, 0.75,
                                 interpolate="bilinear")
        assert (w, h) == (384, 288)
        got = blocks_to_array(out, w, h)
        # whole-image oracle with the same formulas
        dx = dy = (0.75 - 1) / 2
        ox = np.arange(w)
        oy = np.arange(h)
        sx = (ox - dx) / 0.75
        sy = (oy - dy) / 0.75
        x0 = np.clip(np.floor(sx).astype(int), 0, 511)
        y0 = np.clip(np.floor(sy).astype(int), 0, 383)
        x1 = np.clip(x0 + 1, 0, 511)
        y1 = np.clip(y0 + 1, 0, 383)
        fx = np.clip(sx - x0, 0, 1)[None, :, None]
        fy = np.clip(sy - y0, 0, 1)[:, None, None]
        val = (img[np.ix_(y0, x0)] * (1 - fx) * (1 - fy)
               + img[np.ix_(y0, x1)] * fx * (1 - fy)
               + img[np.ix_(y1, x0)] * (1 - fx) * fy
               + img[np.ix_(y1, x1)] * fx * fy)
        want = np.floor(val + 0.5).astype(np.uint8)
        assert np.array_equal(got, want)


def _conv_oracle(img, xscale, yscale, method, out_w, out_h):
    """Whole-image separable-convolution oracle (no blocks, no halo
    logic — an independent check of scale_blocks' distributed
    assembly)."""
    from gdal2mbtiles_spark.operators.resample import (KERNEL_SUPPORT,
                                                       _kernel_weights)
    H, W = img.shape[:2]
    dx = (xscale - 1.0) / 2.0
    dy = (yscale - 1.0) / 2.0
    sx = (np.arange(out_w) - dx) / xscale
    sy = (np.arange(out_h) - dy) / yscale
    sup = KERNEL_SUPPORT[method]
    offs = np.arange(-sup + 1, sup + 1)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    wx = _kernel_weights(sx - x0, method)
    wy = _kernel_weights(sy - y0, method)
    acc = np.zeros((out_h, out_w, 4))
    for jy, oy in enumerate(offs):
        iy = np.clip(y0 + oy, 0, H - 1)
        row = np.zeros((out_h, W, 4))
        row += img[iy].astype(np.float64)
        tmp = np.zeros((out_h, out_w, 4))
        for jx, ox_ in enumerate(offs):
            ix = np.clip(x0 + ox_, 0, W - 1)
            tmp += wx[None, :, jx, None] * row[:, ix]
        acc += wy[:, jy, None, None] * tmp
    return np.floor(np.clip(acc, 0, 255) + 0.5).astype(np.uint8)


class TestConvolutionKernels:
    """cubic / cubicspline / lanczos (reference surface
    gdal.py:65-71; applied via gdalwarp -r in the reference,
    engine-side here)."""

    @pytest.mark.parametrize("method", ["cubic", "cubicspline",
                                        "lanczos"])
    def test_identity_at_unit_scale(self, spark, method):
        # interpolating kernels: w(0)=1, w(+-1)=w(+-2)=0 -> identity
        # (cubicspline is a smoothing kernel, excluded by nature)
        img = gradient_img(300, 260)
        blocks = blocks_from_array(spark, img)
        out, w, h = scale_blocks(blocks, 300, 260, 1.0, 1.0,
                                 interpolate=method)
        got = blocks_to_array(out, w, h)
        if method == "cubicspline":
            # B-spline smooths: constant channels must still be exact
            assert np.array_equal(got[..., 2], img[..., 2])
            assert np.array_equal(got[..., 3], img[..., 3])
        else:
            assert np.array_equal(got, img)

    @pytest.mark.parametrize("method", ["cubic", "cubicspline",
                                        "lanczos"])
    def test_constant_image_invariant(self, spark, method):
        # normalized weights: any scale of a constant image is
        # constant (no ringing against the zero padding thanks to
        # edge-clamped taps)
        img = np.full((260, 300, 4), 137, dtype=np.uint8)
        blocks = blocks_from_array(spark, img)
        out, w, h = scale_blocks(blocks, 300, 260, 0.61, 0.61,
                                 interpolate=method)
        got = blocks_to_array(out, w, h)
        assert (got == 137).all()

    def test_cubic_reproduces_linear_ramp(self, spark):
        # Keys a=-0.5 reproduces degree-1 polynomials exactly: a
        # horizontal ramp stays an exact ramp in the interior
        img = np.zeros((256, 256, 4), dtype=np.uint8)
        img[..., 0] = np.arange(256)[None, :]
        img[..., 3] = 255
        blocks = blocks_from_array(spark, img)
        out, w, h = scale_blocks(blocks, 256, 256, 0.5, 0.5,
                                 interpolate="cubic")
        got = blocks_to_array(out, w, h).astype(np.float64)
        # sample x = (X + 0.25) / 0.5 = 2X + 0.5 -> value 2X + 0.5,
        # rounded half-up to 2X + 1 (interior columns only: edge taps
        # clamp)
        interior = np.arange(2, w - 2)
        want = 2 * interior + 1
        assert np.array_equal(got[5, interior, 0], want)

    @pytest.mark.parametrize("method,scale", [
        ("cubic", 0.73), ("cubic", 1.38), ("cubicspline", 0.61),
        ("lanczos", 0.73), ("lanczos", 1.38)])
    def test_seams_equal_whole_image(self, spark, method, scale):
        # the distributed block path (halo = kernel support) must be
        # bit-identical to the whole-image convolution
        img = gradient_img(520, 390)
        blocks = blocks_from_array(spark, img)
        out, w, h = scale_blocks(blocks, 520, 390, scale, scale,
                                 interpolate=method)
        got = blocks_to_array(out, w, h)
        want = _conv_oracle(img, scale, scale, method, w, h)
        assert np.array_equal(got, want)


class TestResampleRules:
    def test_foreign_500x250_to_world(self, spark):
        # tests/test_vips.py:169-176: 500x250 world -> 512x256 resample
        meta = whole_world_raster_meta(500, 250)
        blocks = blocks_from_array(spark, gradient_img(500, 250))
        out, m2 = resample_blocks(blocks, meta, to_world=True)
        assert (m2.xsize, m2.ysize) == (512, 256)
        # world pixel width forced to full world
        assert m2.geotransform[1] == pytest.approx(CIRC / 512)

    def test_slightly_too_big_downsamples(self, spark):
        # tests/test_vips.py:178-190: 258px world -> z0 -> 256x256
        meta = whole_world_raster_meta(258, 258)
        assert meta.native_resolution() == 0
        blocks = blocks_from_array(spark, gradient_img(258, 258))
        out, m2 = resample_blocks(blocks, meta)
        assert (m2.xsize, m2.ysize) == (256, 256)

    def test_no_op_when_ratio_unity(self, spark):
        meta = whole_world_raster_meta(1024, 1024)
        blocks = blocks_from_array(spark, gradient_img(64, 64))
        out, m2 = resample_blocks(blocks, meta)
        assert out is blocks and m2 is meta


class TestAlignToGrid:
    def test_spanning_aligns_to_quadrant(self, spark):
        # 412px at z2 pixel size, 50px inset: aligns to 512x512 with
        # transparent 50px borders (tests/test_vips.py:192-227 shape)
        px = HALF / 512
        meta = RasterMeta(412, 412, (-HALF + 50 * px, px, 0.0,
                                     -50 * px, 0.0, -px))
        img = gradient_img(412, 412)
        blocks = blocks_from_array(spark, img)
        out, m2 = align_to_grid_blocks(blocks, meta)
        assert (m2.xsize, m2.ysize) == (512, 512)
        got = blocks_to_array(out, 512, 512)
        # UL corner transparent (tests/test_vips.py:214-227)
        assert got[0, 0].tolist() == [0, 0, 0, 0]
        assert got[49, 49].tolist() == [0, 0, 0, 0]
        # data region intact
        assert np.array_equal(got[50:462, 50:462], img)
        # right/bottom borders transparent
        assert (got[:, 462:] == 0).all() and (got[462:, :] == 0).all()
        # geotransform snapped to the SW quadrant
        assert m2.geotransform[0] == pytest.approx(-HALF, abs=1)
        assert m2.geotransform[3] == pytest.approx(0.0, abs=1)

    def test_aligned_is_noop(self, spark):
        meta = whole_world_raster_meta(512, 512)
        blocks = blocks_from_array(spark, gradient_img(512, 512))
        out, m2 = align_to_grid_blocks(blocks, meta)
        assert out is blocks and m2 is meta

    def test_aligned_blocks_to_tiles_roundtrip(self, spark):
        # spanning -> align -> tiles must equal the quadrant tile set
        px = HALF / 512
        meta = RasterMeta(412, 412, (-HALF + 50 * px, px, 0.0,
                                     -50 * px, 0.0, -px))
        blocks = blocks_from_array(spark, gradient_img(412, 412))
        aligned, m2 = align_to_grid_blocks(blocks, meta)
        tiles = blocks_to_tiles(aligned, m2)
        keys = {(r["z"], r["x"], r["y"])
                for r in tiles.select("z", "x", "y").collect()}
        assert keys == {(2, x, y) for x in range(2) for y in range(2)}
