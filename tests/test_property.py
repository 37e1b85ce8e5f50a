"""Property-based tests (hypothesis) for the pure kernels: grid
round-trips, cell packing, ray casting vs an independent convex-hull
oracle, PNG codec round-trip, hash reinterpretation."""

import os
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal2mbtiles_spark.cells import (cell_from_lonlat, cell_parent,
                                      lonlat_to_xyz, pack_cell,
                                      unpack_cell)
from gdal2mbtiles_spark.functions.hashing import (intmd5, signed_low64)
from gdal2mbtiles_spark.grid import (mercator_to_wgs84,
                                     wgs84_to_mercator)
from gdal2mbtiles_spark.operators.spatial import ray_cast_contains
from gdal2mbtiles_spark.renderers import (decode_png_rgba,
                                          encode_png8, encode_png_rgba)

lon_st = st.floats(min_value=-179.999, max_value=179.999,
                   allow_nan=False)
lat_st = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)


class TestGridProps:
    @given(lon_st, lat_st)
    @settings(max_examples=200, deadline=None)
    def test_mercator_round_trip(self, lon, lat):
        x, y = wgs84_to_mercator(lon, lat)
        lon2, lat2 = mercator_to_wgs84(x, y)
        assert abs(lon - lon2) < 1e-9
        assert abs(lat - lat2) < 1e-9

    @given(lon_st, lat_st, st.integers(min_value=0, max_value=20))
    @settings(max_examples=200, deadline=None)
    def test_cell_pack_round_trip(self, lon, lat, res):
        c = cell_from_lonlat(np.array([lon]), np.array([lat]), res)
        r, x, y = unpack_cell(c)
        assert int(r[0]) == res
        x2, y2 = lonlat_to_xyz(np.array([lon]), np.array([lat]), res)
        assert int(x[0]) == int(x2[0]) and int(y[0]) == int(y2[0])
        assert pack_cell(x, y, res)[0] == c[0]

    @given(lon_st, lat_st, st.integers(min_value=1, max_value=20))
    @settings(max_examples=200, deadline=None)
    def test_parent_contains_child(self, lon, lat, res):
        c = cell_from_lonlat(np.array([lon]), np.array([lat]), res)
        p = cell_parent(c, res - 1)
        pc = cell_from_lonlat(np.array([lon]), np.array([lat]),
                              res - 1)
        assert p[0] == pc[0]


class TestRayCastProps:
    @given(st.integers(min_value=3, max_value=12),
           st.floats(min_value=0.5, max_value=5.0, allow_nan=False),
           st.floats(min_value=-50, max_value=50),
           st.floats(min_value=-50, max_value=50),
           st.integers(min_value=0, max_value=10_000))
    @settings(max_examples=150, deadline=None)
    def test_convex_oracle(self, k, r, cx, cy, seed):
        """For a convex regular k-gon, even-odd ray casting must agree
        with the half-plane (cross-product sign) test."""
        ang = 2 * np.pi * np.arange(k) / k
        xs = cx + r * np.cos(ang)
        ys = cy + r * np.sin(ang)
        rng = np.random.default_rng(seed)
        px = cx + rng.uniform(-2 * r, 2 * r, 64)
        py = cy + rng.uniform(-2 * r, 2 * r, 64)
        got = ray_cast_contains(px, py, xs, ys)
        # independent oracle: inside iff all cross products same sign
        inside = np.ones(64, dtype=bool)
        on_edge = np.zeros(64, dtype=bool)
        for i in range(k):
            j = (i + 1) % k
            cross = ((xs[j] - xs[i]) * (py - ys[i])
                     - (ys[j] - ys[i]) * (px - xs[i]))
            inside &= cross > 0
            on_edge |= np.abs(cross) < 1e-9 * r
        mask = ~on_edge  # boundary pixels may differ by convention
        assert (got[mask] == inside[mask]).all()


class TestCodecProps:
    @given(st.integers(min_value=0, max_value=2 ** 31),
           st.integers(min_value=1, max_value=16),
           st.integers(min_value=1, max_value=16))
    @settings(max_examples=50, deadline=None)
    def test_png_round_trip(self, seed, w, h):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        back = decode_png_rgba(encode_png_rgba(img.tobytes(),
                                               width=w, height=h))
        assert np.array_equal(back, img)

    @given(st.integers(min_value=0, max_value=2 ** 31),
           st.integers(min_value=2, max_value=8))
    @settings(max_examples=50, deadline=None)
    def test_png8_exact_palette_round_trip(self, seed, ncolors):
        rng = np.random.default_rng(seed)
        palette = rng.integers(0, 256, (ncolors, 4), dtype=np.uint8)
        idx = rng.integers(0, ncolors, (8, 8))
        img = palette[idx]
        back = decode_png_rgba(encode_png8(img.tobytes(), width=8,
                                           height=8, max_colors=256))
        assert np.array_equal(back, img)


class TestHashProps:
    @given(st.binary(min_size=0, max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_signed_low64_matches_pack_trick(self, data):
        h = intmd5(data)
        want = struct.unpack(b"q", struct.pack(
            b"Q", h & 0xFFFFFFFFFFFFFFFF))[0]
        assert signed_low64(h) == want


class TestProjectionProperties:
    """Round-5 projection engine: forward/inverse round-trips over
    each CRS's valid domain, and the antimeridian wrap identity."""

    @given(st.floats(min_value=-20.0, max_value=26.0,
                     allow_nan=False),
           st.floats(min_value=-80.0, max_value=84.0,
                     allow_nan=False))
    @settings(max_examples=80, deadline=None)
    def test_utm_round_trip(self, lon, lat):
        from gdal2mbtiles_spark.proj import projection_for_epsg
        p = projection_for_epsg(32631)           # lon0 = 3
        e, n = p.forward(np.array([lon]), np.array([lat]))
        lon2, lat2 = p.inverse(e, n)
        assert abs(lon2[0] - lon) < 1e-9
        assert abs(lat2[0] - lat) < 1e-9

    @given(st.floats(min_value=-10.0, max_value=15.0,
                     allow_nan=False),
           st.floats(min_value=38.0, max_value=55.0,
                     allow_nan=False))
    @settings(max_examples=80, deadline=None)
    def test_lcc_round_trip(self, lon, lat):
        from gdal2mbtiles_spark.proj import projection_for_epsg
        p = projection_for_epsg(2154)
        e, n = p.forward(np.array([lon]), np.array([lat]))
        lon2, lat2 = p.inverse(e, n)
        assert abs(lon2[0] - lon) < 1e-9
        assert abs(lat2[0] - lat) < 1e-9

    @given(st.floats(min_value=-180.0, max_value=180.0,
                     allow_nan=False),
           st.floats(min_value=62.0, max_value=89.5,
                     allow_nan=False))
    @settings(max_examples=80, deadline=None)
    def test_polar_round_trip(self, lon, lat):
        from gdal2mbtiles_spark.proj import projection_for_epsg
        p = projection_for_epsg(3413)
        e, n = p.forward(np.array([lon]), np.array([lat]))
        lon2, lat2 = p.inverse(e, n)
        dlon = (lon2[0] - lon + 180.0) % 360.0 - 180.0
        assert abs(dlon) < 1e-9 or abs(lat) > 89.4
        assert abs(lat2[0] - lat) < 1e-9

    @given(st.floats(min_value=-130.0, max_value=-60.0,
                     allow_nan=False),
           st.floats(min_value=20.0, max_value=50.0,
                     allow_nan=False))
    @settings(max_examples=80, deadline=None)
    def test_albers_round_trip(self, lon, lat):
        from gdal2mbtiles_spark.proj import projection_for_epsg
        p = projection_for_epsg(5070)
        e, n = p.forward(np.array([lon]), np.array([lat]))
        lon2, lat2 = p.inverse(e, n)
        assert abs(lon2[0] - lon) < 1e-8
        assert abs(lat2[0] - lat) < 1e-8

    @given(st.floats(min_value=-179.0, max_value=179.0,
                     allow_nan=False),
           st.floats(min_value=-80.0, max_value=84.0,
                     allow_nan=False))
    @settings(max_examples=60, deadline=None)
    def test_antimeridian_wrap_identity(self, lon, lat):
        """forward(lon) == forward(lon +- 360): the conditional
        delta-lon wrap makes a zone-1 source east of +180 project
        correctly (round-5 antimeridian fix)."""
        from hypothesis import assume

        from gdal2mbtiles_spark.proj import projection_for_epsg
        for epsg, lon0 in ((32601, -177.0), (2154, 3.0)):
            # the antipodal meridian (|delta lon| = 180) is genuinely
            # ambiguous — both wrap choices are 180 away
            dl = ((lon - lon0 + 180.0) % 360.0) - 180.0
            assume(abs(dl) < 179.0)
            p = projection_for_epsg(epsg)
            e0, n0 = p.forward(np.array([lon]), np.array([lat]))
            for shift in (-360.0, 360.0):
                e1, n1 = p.forward(np.array([lon + shift]),
                                   np.array([lat]))
                # relative tolerance: far outside the zone the TM
                # series produces huge (invalid-domain) eastings
                # where absolute fp noise scales with magnitude
                tol = 1e-9 * max(1.0, abs(e0[0]), abs(n0[0]))
                assert abs(e1[0] - e0[0]) < tol, (epsg, shift)
                assert abs(n1[0] - n0[0]) < tol, (epsg, shift)


class TestAvroProperties:
    @given(st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1))
    @settings(max_examples=200, deadline=None)
    def test_zigzag_long_round_trip(self, n):
        import io

        from gdal2mbtiles_spark.sources.avro import (read_long,
                                                     write_long)
        buf = bytearray()
        write_long(buf, n)
        assert read_long(io.BytesIO(bytes(buf))) == n

    @given(st.lists(st.tuples(
        st.integers(min_value=-(2 ** 40), max_value=2 ** 40),
        st.text(max_size=20),
        st.one_of(st.none(), st.binary(max_size=16)),
        st.lists(st.integers(min_value=-100, max_value=100),
                 max_size=5),
        st.booleans(),
        st.floats(allow_nan=False, allow_infinity=False,
                  width=64)), max_size=10))
    @settings(max_examples=40, deadline=None)
    def test_container_round_trip(self, rows):
        import tempfile

        from gdal2mbtiles_spark.sources import avro
        schema = {"type": "record", "name": "r", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": ["null", "bytes"], "default": None},
            {"name": "d", "type": {"type": "array", "items": "long"}},
            {"name": "e", "type": "boolean"},
            {"name": "f", "type": "double"},
        ]}
        recs = [{"a": a, "b": b, "c": c, "d": d, "e": e, "f": f}
                for a, b, c, d, e, f in rows]
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "t.avro")
            avro.write_container(path, schema, recs)
            assert list(avro.read_container(path)) == recs


class TestCoverProperties:
    @given(st.integers(min_value=3, max_value=8),
           st.floats(min_value=1.0, max_value=20.0, allow_nan=False),
           st.floats(min_value=-140.0, max_value=140.0,
                     allow_nan=False),
           st.floats(min_value=-55.0, max_value=55.0,
                     allow_nan=False),
           st.integers(min_value=0, max_value=10_000),
           st.integers(min_value=4, max_value=8))
    @settings(max_examples=60, deadline=None)
    def test_polygon_cover_contains_interior_points(
            self, k, r, cx, cy, seed, res):
        """Every interior point's tile is in the scanline cover — the
        invariant the round-4 bbox->exact-cover rewrite (and the
        round-5 vacuous-band-test ADVICE fix) must preserve."""
        from gdal2mbtiles_spark.cells import polygon_cover_xy
        rng = np.random.default_rng(seed)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        xs = cx + r * np.cos(ang)
        ys = cy + r * 0.5 * np.sin(ang)
        cover = set(zip(*[a.tolist()
                          for a in polygon_cover_xy(xs, ys, res)]))
        assert cover
        # sample interior points as convex combinations of vertices
        w = rng.uniform(0, 1, (50, k))
        w /= w.sum(axis=1, keepdims=True)
        px = w @ xs
        py = w @ ys
        tx, ty = lonlat_to_xyz(px, py, res)
        for a, b in zip(tx.tolist(), ty.tolist()):
            assert (a, b) in cover
