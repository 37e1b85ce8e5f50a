"""Foreign-SRS (UTM) support: closed-form transverse Mercator and the
distributed inverse-mapping warp.

The reference warps foreign SRS via ``gdalwarp -t_srs``
(gdal.py:176-220; tests/test_gdal.py bluemarble-spanning-foreign);
this engine implements the WGS84 UTM family from the public Karney
series.  Validation is by INDEPENDENT methods (numerically integrated
meridian arc, finite-difference scale factor, a single-machine numpy
warp oracle), so no PROJ is needed to trust the math.
"""

import json
import math
import sqlite3

import numpy as np
import pytest

from gdal2mbtiles_spark.cells import MAX_MERCATOR_LAT
from gdal2mbtiles_spark.operators.reproject import (
    mercator_meta_for_tiles, pick_target_zoom, reproject_utm_to_tiles)
from gdal2mbtiles_spark.operators.resample import blocks_from_array
from gdal2mbtiles_spark.proj import (
    A_WGS84, E2, UTM_K0, is_utm_epsg, meridian_arc_numeric, tm_forward,
    tm_inverse, utm_params)


class TestTransverseMercator:
    def test_utm_params(self):
        assert utm_params(32631) == (3.0, 0.0)          # zone 31 N
        assert utm_params(32733) == (15.0, 10_000_000.0)  # zone 33 S
        assert is_utm_epsg(32601) and is_utm_epsg(32760)
        assert not is_utm_epsg(3857) and not is_utm_epsg(27700)
        with pytest.raises(ValueError):
            utm_params(27700)

    def test_central_meridian_origin(self):
        e, n = tm_forward(np.array([3.0]), np.array([0.0]), 3.0)
        assert e[0] == pytest.approx(500_000.0, abs=1e-6)
        assert n[0] == pytest.approx(0.0, abs=1e-6)

    def test_meridian_arc_independent_integral(self):
        # northing on the central meridian must equal k0 x the
        # numerically integrated meridian distance — an oracle that
        # shares NO series coefficients with the implementation
        for lat in (15.0, 45.0, 70.0):
            _, n = tm_forward(np.array([3.0]), np.array([lat]), 3.0)
            assert n[0] == pytest.approx(
                UTM_K0 * meridian_arc_numeric(lat), abs=1e-5)

    def test_scale_factor_on_central_meridian(self):
        # finite-difference dN/ds along the meridian == k0 (0.9996)
        lat, d = 40.0, 1e-7
        _, n1 = tm_forward(np.array([3.0]), np.array([lat - d]), 3.0)
        _, n2 = tm_forward(np.array([3.0]), np.array([lat + d]), 3.0)
        m = (A_WGS84 * (1 - E2)
             / (1 - E2 * math.sin(math.radians(lat)) ** 2) ** 1.5)
        k = (n2[0] - n1[0]) / (m * math.radians(2 * d))
        assert k == pytest.approx(UTM_K0, abs=1e-8)

    def test_round_trip_over_zone(self):
        rng = np.random.RandomState(0)
        lon = rng.uniform(-1.0, 7.0, 5000)   # zone 31 +/- overshoot
        lat = rng.uniform(-80.0, 84.0, 5000)
        e, n = tm_forward(lon, lat, 3.0)
        lon2, lat2 = tm_inverse(e, n, 3.0)
        assert np.abs(lon2 - lon).max() < 1e-11
        assert np.abs(lat2 - lat).max() < 1e-11

    def test_southern_hemisphere_false_northing(self):
        e, n = tm_forward(np.array([15.0]), np.array([-30.0]), 15.0,
                          fn=10_000_000.0)
        assert 0 < n[0] < 10_000_000.0
        lon2, lat2 = tm_inverse(e, n, 15.0, fn=10_000_000.0)
        assert lat2[0] == pytest.approx(-30.0, abs=1e-11)


W, H = 700, 600
GT = (400000.0, 100.0, 0.0, 5500000.0, 0.0, -100.0)
EPSG = 32631


def _utm_img():
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    img = np.zeros((H, W, 4), np.uint8)
    img[..., 0] = gx % 256
    img[..., 1] = gy % 256
    img[..., 2] = (gx // 7 + gy // 11) % 256
    img[..., 3] = 255
    return img


def _oracle_tile(img, tx, ty_xyz, z, interpolate):
    """Single-machine inverse-mapping warp of one tile — independent
    of the block-join/assembly machinery under test."""
    lon0, fn = utm_params(EPSG)
    n = 1 << z
    px = tx + (np.arange(256) + 0.5) / 256
    py = ty_xyz + (np.arange(256) + 0.5) / 256
    mx, my = np.meshgrid(px, py)
    lon = mx / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(math.pi * (1 - 2 * my / n))))
    e, nn = tm_forward(lon.ravel(),
                       np.clip(lat, -MAX_MERCATOR_LAT,
                               MAX_MERCATOR_LAT).ravel(), lon0, fn=fn)
    u = (e - GT[0]) / GT[1] - 0.5
    v = (GT[3] - nn) / 100.0 - 0.5
    want = np.zeros((256 * 256, 4), np.uint8)
    inside = ((u >= -0.5) & (u <= W - 0.5)
              & (v >= -0.5) & (v <= H - 0.5))
    if interpolate == "near":
        iu = np.clip(np.rint(u).astype(int), 0, W - 1)
        iv = np.clip(np.rint(v).astype(int), 0, H - 1)
        want[inside] = img[iv[inside], iu[inside]]
    else:
        u0 = np.floor(u).astype(int)
        v0 = np.floor(v).astype(int)
        fu = (u - u0)[:, None]
        fv = (v - v0)[:, None]
        u0c, u1c = np.clip(u0, 0, W - 1), np.clip(u0 + 1, 0, W - 1)
        v0c, v1c = np.clip(v0, 0, H - 1), np.clip(v0 + 1, 0, H - 1)
        acc = (img[v0c, u0c] * (1 - fu) * (1 - fv)
               + img[v0c, u1c] * fu * (1 - fv)
               + img[v1c, u0c] * (1 - fu) * fv
               + img[v1c, u1c] * fu * fv)
        want[inside] = np.rint(acc[inside]).astype(np.uint8)
    return want.reshape(256, 256, 4)


class TestReprojectWarp:
    @pytest.mark.parametrize("interpolate", ["near", "bilinear"])
    def test_matches_single_machine_oracle(self, spark, interpolate):
        img = _utm_img()
        tiles = reproject_utm_to_tiles(
            spark, blocks_from_array(spark, img), GT, W, H, EPSG,
            interpolate=interpolate)
        rows = tiles.collect()
        assert len(rows) > 4
        z = rows[0]["z"]
        n = 1 << z
        lit = 0
        for r in rows:
            got = np.frombuffer(bytes(r["px"]), np.uint8).reshape(
                256, 256, 4)
            want = _oracle_tile(img, int(r["x"]), n - 1 - int(r["y"]),
                                z, interpolate)
            assert np.array_equal(got, want), (r["x"], r["y"])
            lit += int((got[..., 3] > 0).sum())
        # warped footprint ~ source area (k0 + distortion ~ 1%)
        assert abs(lit - W * H) / (W * H) < 0.05

    def test_target_zoom_matches_ground_resolution(self):
        # 100 m/px at ~49.6N -> z10 (ground res 101.5 m/px); a 10x
        # finer source picks a deeper zoom
        assert pick_target_zoom(100.0, 49.6) == 10
        assert pick_target_zoom(10.0, 49.6) in (13, 14)

    def test_kernels_differ(self, spark):
        img = _utm_img()
        blocks = blocks_from_array(spark, img)
        a = {(r["x"], r["y"]): bytes(r["px"])
             for r in reproject_utm_to_tiles(
                 spark, blocks, GT, W, H, EPSG,
                 interpolate="near").collect()}
        b = {(r["x"], r["y"]): bytes(r["px"])
             for r in reproject_utm_to_tiles(
                 spark, blocks, GT, W, H, EPSG,
                 interpolate="bilinear").collect()}
        assert set(a) == set(b)
        assert any(a[k] != b[k] for k in a)

    def test_mercator_meta_is_tile_aligned(self, spark):
        img = _utm_img()
        tiles = reproject_utm_to_tiles(
            spark, blocks_from_array(spark, img), GT, W, H, EPSG)
        meta = mercator_meta_for_tiles(tiles)
        # must slice cleanly for the downstream pyramid
        meta.tms_extents()
        assert meta.xsize % 256 == 0 and meta.ysize % 256 == 0


class TestCliUtm:
    def test_utm_descriptor_end_to_end(self, spark, tmp_path):
        from gdal2mbtiles_spark.cli import main
        desc = tmp_path / "utm.json"
        desc.write_text(json.dumps(
            {"kind": "synthetic", "xsize": W, "ysize": H,
             "epsg": EPSG, "geotransform": list(GT)}))
        out = tmp_path / "utm.mbtiles"
        assert main([str(desc), str(out)]) == 0
        con = sqlite3.connect(out)
        md = dict(con.execute("SELECT name, value FROM metadata"))
        n_tiles = con.execute("SELECT count(*) FROM tiles").fetchone()[0]
        assert n_tiles > 4
        assert int(md["x-maxzoom"]) >= 10

    def test_utm_rejects_bad_targets_and_kernels(self, tmp_path):
        from gdal2mbtiles_spark.cli import main
        desc = tmp_path / "utm.json"
        desc.write_text(json.dumps(
            {"kind": "synthetic", "xsize": 64, "ysize": 64,
             "epsg": EPSG, "geotransform": list(GT)}))
        with pytest.raises(SystemExit, match="warp target"):
            main([str(desc), "--spatial-reference", "4326"])
        with pytest.raises(SystemExit, match="reprojection path"):
            main([str(desc), "--resampling", "lanczos"])
        desc2 = tmp_path / "nogt.json"
        desc2.write_text(json.dumps(
            {"kind": "synthetic", "xsize": 64, "ysize": 64,
             "epsg": EPSG}))
        with pytest.raises(SystemExit, match="geotransform"):
            main([str(desc2)])
