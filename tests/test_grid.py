"""Phase-0 geodesy tests.

Numeric expectations transcribed from the reference test-suite
(/root/reference/tests/test_gdal.py, test_spatial_reference.py,
test_vips.py) — same fixtures re-expressed as RasterMeta values instead
of GeoTIFF files:

- bluemarble.tif            -> world_1024   (1024x1024 whole-world 3857)
- bluemarble-aligned-ll.tif -> aligned_256  (256x256 SW-of-center quadrant)
- bluemarble-spanning-ll.tif-> spanning_412 (412x412, 50px inset quadrant)
- bluemarble-foreign.tif    -> foreign_500x250
- bluemarble-spanning-foreign.tif -> spanning_foreign_154
- bluemarble-slightly-too-big.tif -> too_big_258
- upsampling.tif            -> world_256
- bluemarble-wgs84.tif      -> wgs84_1309x655
"""

import math

import pytest

from gdal2mbtiles_spark.exceptions import UnalignedInputError
from gdal2mbtiles_spark.grid import (
    XY, CoordTransform, Extents, GridSRS, RasterMeta, SRS_MERCATOR,
    SRS_WGS84, TILE_SIDE, mercator_to_wgs84, validate_resolutions,
    wgs84_to_mercator, whole_world_raster_meta,
)

CIRC = SRS_MERCATOR.major_circumference()
HALF = CIRC / 2
QUARTER = CIRC / 4
Z2_PIXEL = CIRC / 1024  # ~39135.7584766 (tests/test_gdal.py:461-466)


def world_1024():
    return whole_world_raster_meta(1024, 1024)


def world_256():
    return whole_world_raster_meta(256, 256)


def aligned_256():
    # 256x256 covering exactly z2 tile (1,1): (-circ/4,-circ/4)..(0,0)
    px = QUARTER / 256
    return RasterMeta(xsize=256, ysize=256,
                      geotransform=(-QUARTER, px, 0.0, 0.0, 0.0, -px))


def spanning_412():
    # 412x412 at z2 pixel size, 50px inset from the SW quadrant corners
    # (tests/test_gdal.py:589-612: "Spanning file is 50 pixels in from
    # alignment")
    px = HALF / 512  # z2 native pixel
    return RasterMeta(xsize=412, ysize=412,
                      geotransform=(-HALF + 50 * px, px, 0.0,
                                    -50 * px, 0.0, -px))


def foreign_500x250():
    return whole_world_raster_meta(500, 250)


def spanning_foreign_154():
    # native-z1 region scaled by 3/4 (=> ratio 4/3), like
    # bluemarble-spanning-foreign.tif (pixel 104362.0226042)
    px = CIRC / 512 * 4 / 3
    return RasterMeta(xsize=154, ysize=154,
                      geotransform=(-HALF + 50 * px, px, 0.0,
                                    -50 * px, 0.0, -px))


def too_big_258():
    return whole_world_raster_meta(258, 258)


def wgs84_1309x655():
    return whole_world_raster_meta(1309, 655, srs=SRS_WGS84)


class TestSpatialReference:
    def test_circumference(self):
        # tests/test_gdal.py:944-947
        assert round(CIRC, 4) == 40075016.6856
        assert round(SRS_MERCATOR.minor_circumference(), 4) == 40075016.6856
        assert SRS_WGS84.major_circumference() == 360.0

    def test_world_extents(self):
        we = SRS_MERCATOR.world_extents()
        assert we.lower_left.almost_equal(XY(-HALF, -HALF), places=0)
        assert we.upper_right.almost_equal(XY(HALF, HALF), places=0)
        wg = SRS_WGS84.world_extents()
        assert wg == Extents(XY(-180.0, -90.0), XY(180.0, 90.0))

    def test_tile_pixel_dimensions(self):
        # tests/test_gdal.py:1007-1020: geographic z0 covers a hemisphere
        td = SRS_WGS84.tile_dimensions(0)
        assert td == XY(180.0, 180.0)
        assert SRS_MERCATOR.pixel_dimensions(2).x == pytest.approx(
            39135.7584766, abs=1e-3)

    def test_tiles_count(self):
        # z2 world = 4x4 (mercator); wgs84 z0 world = 2x1
        assert SRS_MERCATOR.tiles_count(
            SRS_MERCATOR.world_extents(), 2) == XY(4, 4)
        assert SRS_WGS84.tiles_count(
            SRS_WGS84.world_extents(), 0) == XY(2, 1)

    def test_offset_point(self):
        assert SRS_MERCATOR.offset_point(-HALF, -HALF).almost_equal(
            XY(0.0, 0.0))
        # geographic: minor offset is a quarter circumference (90 deg)
        assert SRS_WGS84.offset_point(-180.0, -90.0) == XY(0.0, 0.0)
        # reverse round-trips
        pt = SRS_MERCATOR.offset_point(123.0, 456.0)
        assert SRS_MERCATOR.offset_point(*pt, reverse=True).almost_equal(
            XY(123.0, 456.0))


class TestTransforms:
    def test_round_trip(self):
        x, y = wgs84_to_mercator(-90.0, -45.0)
        lon, lat = mercator_to_wgs84(x, y)
        assert lon == pytest.approx(-90.0, abs=1e-9)
        assert lat == pytest.approx(-45.0, abs=1e-9)

    def test_world_corner(self):
        x, y = wgs84_to_mercator(180.0, 0.0)
        assert x == pytest.approx(HALF, abs=1e-6)
        assert y == pytest.approx(0.0, abs=1e-6)

    def test_extents_wgs84(self):
        # tests/test_gdal.py:552-561: whole world ~ (-180,-85)..(180,85)
        t = CoordTransform(SRS_MERCATOR, SRS_WGS84)
        ll, ur = world_1024().extents(transform=t)
        assert round(ll.x) == -180 and round(ur.x) == 180
        assert round(ll.y) == -85 and round(ur.y) == 85

    def test_extents_partial_wgs84(self):
        # tests/test_gdal.py:613-626: aligned quadrant -> -66.5 deg south
        t = CoordTransform(SRS_MERCATOR, SRS_WGS84)
        ll, ur = aligned_256().extents(transform=t)
        assert round(ll.x) == -90 and round(ur.x) == 0
        assert round(ll.y, 1) == pytest.approx(-66.5, abs=0.1)
        assert round(ur.y) == 0


class TestPixelDimensions:
    # tests/test_gdal.py:461-478
    def test_values(self):
        assert world_1024().pixel_dimensions().x == pytest.approx(
            39135.7584766, abs=1e-3)
        assert world_1024().pixel_dimensions().y == pytest.approx(
            -39135.7584766, abs=1e-3)
        assert world_256().pixel_dimensions().x == pytest.approx(
            156543.0339062, abs=1e-3)
        assert spanning_foreign_154().pixel_dimensions().x == pytest.approx(
            104362.0226042, abs=1e-3)


class TestNativeResolution:
    # tests/test_gdal.py:438-459
    def test_world_1024(self):
        d = world_1024()
        assert d.native_resolution() == 2
        assert d.native_resolution(maximum=1) == 1
        assert d.native_resolution(maximum=10) == 2

    def test_world_256(self):
        assert world_256().native_resolution() == 0

    def test_slightly_too_big(self):
        # tests/test_vips.py:178-190: 258px world must pick z0 (halving
        # error tolerance), NOT z1.
        assert too_big_258().native_resolution() == 0

    def test_aligned(self):
        assert aligned_256().native_resolution() == 2

    def test_foreign(self):
        assert foreign_500x250().native_resolution() == 1
        assert spanning_foreign_154().native_resolution() == 1

    def test_wgs84(self):
        assert wgs84_1309x655().native_resolution() == 2


class TestScalingRatios:
    # tests/test_gdal.py:792-819
    def test_unity(self):
        r = world_1024().scaling_ratios()
        assert r.x == pytest.approx(1.0) and r.y == pytest.approx(1.0)
        r = world_256().scaling_ratios(places=5)
        assert r == XY(1.0, 1.0)

    def test_four_thirds(self):
        r = spanning_foreign_154().scaling_ratios()
        assert r.x == pytest.approx(4.0 / 3.0)
        r = spanning_foreign_154().scaling_ratios(places=5)
        assert r == XY(1.33333, 1.33333)

    def test_world_ratios_foreign(self):
        r = foreign_500x250().world_scaling_ratios()
        assert r.x == pytest.approx(1.024)
        assert r.y == pytest.approx(1.024)  # capped at xscale


class TestTmsExtents:
    # tests/test_gdal.py:821-856
    def test_world(self):
        d = world_1024()
        assert d.tms_extents() == Extents(XY(0, 0), XY(4, 4))
        assert d.tms_extents(resolution=0) == Extents(XY(0, 0), XY(1, 1))

    def test_wgs84_z0(self):
        # two tiles at z0 for geographic SRS (tests/test_gdal.py:832-839)
        d = wgs84_1309x655()
        assert d.tms_extents(resolution=0) == Extents(XY(0, 0), XY(2, 1))

    def test_aligned(self):
        d = aligned_256()
        assert d.tms_extents() == Extents(XY(1, 1), XY(2, 2))
        assert d.tms_extents(resolution=1) == Extents(XY(0, 0), XY(1, 1))

    def test_spanning_raises(self):
        with pytest.raises(UnalignedInputError):
            spanning_412().tms_extents()

    def test_world_tms_extents(self):
        d = world_1024()
        assert d.world_tms_extents() == d.tms_extents()
        assert (aligned_256().world_tms_extents()
                == world_1024().tms_extents())
        assert (spanning_412().world_tms_extents()
                == world_1024().tms_extents())


class TestTiledExtents:
    def test_world_already_aligned(self):
        ll, ur = world_1024().tiled_extents()
        assert round(ll.x) == round(-HALF) and round(ur.x) == round(HALF)

    def test_spanning_rounds_out_to_quadrant(self):
        # tests/test_gdal.py:735-777: spanning file tiles out to the SW
        # quadrant
        ll, ur = spanning_412().tiled_extents()
        assert ll.x == pytest.approx(-HALF, abs=1)
        assert ll.y == pytest.approx(-HALF, abs=1)
        assert ur.x == pytest.approx(0.0, abs=1)
        assert ur.y == pytest.approx(0.0, abs=1)


class TestBorders:
    # tests/test_gdal.py:858-919
    def test_world_has_none(self):
        assert list(world_1024().world_tms_borders()) == []

    def test_aligned(self):
        got = set(aligned_256().world_tms_borders())
        want = {XY(x, y) for x in range(4) for y in range(4)
                if (x, y) != (1, 1)}
        assert got == want
        got1 = set(aligned_256().world_tms_borders(resolution=1))
        assert got1 == {XY(x, y) for x in range(2) for y in range(2)
                        if (x, y) != (0, 0)}


class TestIsWholeWorld:
    def test_world(self):
        assert world_1024().is_whole_world()
        assert too_big_258().is_whole_world()

    def test_partial(self):
        assert not aligned_256().is_whole_world()
        assert not spanning_412().is_whole_world()


class TestValidateResolutions:
    # vips.py:1083-1134 semantics; CLI tests tests/test_scripts.py:142-169
    def test_strict_ok(self):
        assert validate_resolutions(2, 1, 3) == (1, 3)

    def test_strict_min_out_of_range(self):
        with pytest.raises(ValueError):
            validate_resolutions(2, min_resolution=2)
        with pytest.raises(ValueError):
            validate_resolutions(2, min_resolution=-1)

    def test_strict_max_below_native(self):
        with pytest.raises(ValueError):
            validate_resolutions(2, max_resolution=1)

    def test_lenient(self):
        assert validate_resolutions(2, 0, None, strict=False) == (0, None)
        with pytest.raises(ValueError):
            validate_resolutions(2, min_resolution=3, strict=False)
        with pytest.raises(ValueError):
            validate_resolutions(2, min_resolution=3, max_resolution=2,
                                 strict=False)
        with pytest.raises(ValueError):
            validate_resolutions(2, max_resolution=1, strict=False)
