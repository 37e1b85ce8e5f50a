"""Cell index and tile-math tests, incl. Spark<->DuckDB expression
parity (the driver's correctness gate depends on bit-identical
derivations on both engines)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal2mbtiles_spark.cells import (
    DEFAULT_RES, cell_center_lonlat, cell_children, cell_from_lonlat,
    cell_parent, cells_covering_bbox, grid_disk, lonlat_to_xyz,
    pack_cell, unpack_cell)
from gdal2mbtiles_spark.functions.tilemath import (
    cell_id, cell_id_sql, geo_lat, geo_lat_sql, geo_lon, geo_lon_sql,
    tile_x, tile_x_sql, tile_y_tms, tile_y_tms_sql)
from gdal2mbtiles_spark.sources.pages import pages_sql, synth_pages


class TestCellsNumpy:
    def test_known_tiles(self):
        # lon/lat (0,0) at z1 -> tile (1,1) XYZ (NE of center is (1,0);
        # (0,0) falls in x=1,y=1 due to floor at the boundary)
        x, y = lonlat_to_xyz(np.array([0.0]), np.array([0.0]), 1)
        assert (x[0], y[0]) == (1, 1)
        # Greenwich-ish point at z7
        x, y = lonlat_to_xyz(np.array([-0.1276]), np.array([51.5072]), 7)
        assert (x[0], y[0]) == (63, 42)  # standard OSM tile for London

    def test_pack_round_trip(self):
        lon = np.array([-179.9, -1.0, 0.0, 45.5, 179.9])
        lat = np.array([-84.0, -45.0, 0.0, 45.0, 84.0])
        cells = cell_from_lonlat(lon, lat, 7)
        res, x, y = unpack_cell(cells)
        assert (res == 7).all()
        x2, y2 = lonlat_to_xyz(lon, lat, 7)
        assert (x == x2).all() and (y == y2).all()

    def test_parent_child(self):
        c = cell_from_lonlat(np.array([10.0]), np.array([50.0]), 9)[0]
        p = cell_parent(np.array([c]), 7)[0]
        kids = cell_children(int(p), 9)
        assert c in kids
        assert len(kids) == 16

    def test_grid_disk(self):
        c = int(cell_from_lonlat(np.array([10.0]), np.array([50.0]),
                                 7)[0])
        d0 = grid_disk(c, 0)
        assert list(d0) == [c]
        d1 = grid_disk(c, 1)
        assert len(d1) == 9 and c in d1
        # antimeridian wrap: x=0 cell has neighbours at x=n-1
        west = pack_cell(np.array([0]), np.array([60]), 7)[0]
        dw = grid_disk(int(west), 1)
        _, xs, _ = unpack_cell(dw)
        assert (1 << 7) - 1 in xs

    def test_pole_clip(self):
        top = pack_cell(np.array([5]), np.array([0]), 7)[0]
        d = grid_disk(int(top), 1)
        assert len(d) == 6  # 3 clipped off the top

    def test_center_round_trip(self):
        c = cell_from_lonlat(np.array([10.0]), np.array([50.0]), 12)
        lon, lat = cell_center_lonlat(c)
        c2 = cell_from_lonlat(lon, lat, 12)
        assert (c == c2).all()

    def test_bbox_cover(self):
        cover = cells_covering_bbox(-1.0, -1.0, 1.0, 1.0, res=7)
        res, xs, ys = unpack_cell(cover)
        assert (res == 7).all()
        # must contain the cell of every corner
        for lon, lat in [(-1, -1), (1, 1), (0, 0), (-1, 1)]:
            c = cell_from_lonlat(np.array([float(lon)]),
                                 np.array([float(lat)]), 7)[0]
            assert c in cover


class TestSparkDuckdbParity:
    """The same derivations computed by Spark Columns and by the
    emitted SQL in DuckDB must agree exactly."""

    N = 500

    def test_geocode_and_tiles_match(self, spark):
        z = 7
        df = (synth_pages(spark, self.N)
              .select("url",
                      geo_lon(F.col("url")).alias("lon"),
                      geo_lat(F.col("url")).alias("lat")))
        df = df.select(
            "url", "lon", "lat",
            tile_x(F.col("lon"), z).alias("tx"),
            tile_y_tms(F.col("lat"), z).alias("ty"),
            cell_id(F.col("lon"), F.col("lat"), DEFAULT_RES).alias("cell"))
        got = {r["url"]: (r["lon"], r["lat"], r["tx"], r["ty"], r["cell"])
               for r in df.collect()}

        q = f"""
        WITH pages AS ({pages_sql(self.N)})
        SELECT url,
               {geo_lon_sql('url')} AS lon,
               {geo_lat_sql('url')} AS lat,
               {tile_x_sql(geo_lon_sql('url'), z)} AS tx,
               {tile_y_tms_sql(geo_lat_sql('url'), z)} AS ty,
               {cell_id_sql(geo_lon_sql('url'), geo_lat_sql('url'),
                            DEFAULT_RES)} AS cell
        FROM pages
        """
        want = {r[0]: tuple(r[1:]) for r in duckdb.sql(q).fetchall()}
        assert set(got) == set(want)
        for url in got:
            g, w = got[url], want[url]
            assert g[0] == pytest.approx(w[0], abs=0.0), url  # exact
            assert g[1] == pytest.approx(w[1], abs=0.0), url
            assert g[2:] == w[2:], url

    def test_pages_text_invariant(self, spark):
        # F17: byte-identical text per url on both engines
        got = {r["url"]: r["text"]
               for r in synth_pages(spark, 100).collect()}
        want = {r[0]: r[1] for r in duckdb.sql(
            f"WITH p AS ({pages_sql(100)}) SELECT url, text FROM p"
        ).fetchall()}
        assert got == want

    def test_pages_lang_and_ts(self, spark):
        got = {(r["url"], r["lang"], r["warc_ts"])
               for r in synth_pages(spark, 50)
               .select("url", "lang", "warc_ts").collect()}
        want = {(r[0], r[1], r[2]) for r in duckdb.sql(
            f"WITH p AS ({pages_sql(50)}) SELECT url, lang, warc_ts "
            f"FROM p").fetchall()}
        assert got == want


class TestPolygonCover:
    """Exact scanline polygon cover (round-3 VERDICT #2): candidates
    ~ intersecting tiles, never missing one the refine needs."""

    def test_subset_of_bbox_and_no_missing_interior(self):
        from gdal2mbtiles_spark.cells import cells_covering_polygon
        from gdal2mbtiles_spark.operators.spatial import \
            ray_cast_contains
        from gdal2mbtiles_spark.sources.vectors import make_polygons
        rng = np.random.RandomState(7)
        for res in (5, 8):
            for p, xs, ys in make_polygons(30):
                exact = set(int(c) for c in
                            cells_covering_polygon(xs, ys, res=res))
                bbox = set(int(c) for c in cells_covering_bbox(
                    min(xs), min(ys), max(xs), max(ys), res=res))
                assert exact <= bbox
                # random interior points must land in covered cells
                lo_x, hi_x = min(xs), max(xs)
                lo_y, hi_y = min(ys), max(ys)
                px = rng.uniform(lo_x, hi_x, 500)
                py = rng.uniform(lo_y, hi_y, 500)
                inside = ray_cast_contains(px, py, np.array(xs),
                                           np.array(ys))
                cells = cell_from_lonlat(px[inside], py[inside],
                                         res=res)
                missing = set(int(c) for c in cells) - exact
                assert not missing, (p, res, missing)

    def test_diagonal_sliver_linear_not_quadratic(self):
        # a thin diagonal: bbox cover candidates O(rows^2) tiles, the
        # scanline cover O(rows) — the round-3 done-criterion
        from gdal2mbtiles_spark.cells import cells_covering_polygon
        xs = [-60.0, -59.5, 60.0, 59.5]
        ys = [-50.0, -50.0, 50.0, 50.0]
        res = 8
        bbox = cells_covering_bbox(min(xs), min(ys), max(xs), max(ys),
                                   res=res)
        exact = cells_covering_polygon(xs, ys, res=res)
        assert len(bbox) > 7000
        assert len(exact) < len(bbox) / 10

    def test_tilted_cap_sliver_stays_linear(self):
        # round-4 ADVICE: with the in-band test applied AFTER clipping
        # t to [0,1], any NON-horizontal cap edge put every row at full
        # bbox width (240 tiles at res=8).  Tilt the caps slightly and
        # require per-row spans to stay ~2-3 tiles.
        from gdal2mbtiles_spark.cells import polygon_cover_xy
        xs = [-60.0, -59.5, 60.0, 59.5]
        ys = [-50.0, -49.9, 50.0, 49.9]      # caps no longer horizontal
        res = 8
        cx, cy = polygon_cover_xy(xs, ys, res=res)
        import collections
        per_row = collections.Counter(cy.tolist())
        assert max(per_row.values()) <= 4, per_row.most_common(3)
        assert len(cx) < 700       # vacuous-test regression gave 240
        #                            rows x 15 cols at res=8; the
        #                            straight-cap twin covers ~214

    def test_concave_superset_is_conservative(self):
        # U-shape: rows crossing the notch use the row span (superset)
        # but every truly intersecting tile is present
        from gdal2mbtiles_spark.cells import cells_covering_polygon
        from gdal2mbtiles_spark.operators.spatial import \
            ray_cast_contains
        xs = [0.0, 10.0, 10.0, 8.0, 8.0, 2.0, 2.0, 0.0]
        ys = [0.0, 0.0, 10.0, 10.0, 2.0, 2.0, 10.0, 10.0]
        res = 7
        exact = set(int(c) for c in
                    cells_covering_polygon(xs, ys, res=res))
        rng = np.random.RandomState(3)
        px = rng.uniform(0.0, 10.0, 2000)
        py = rng.uniform(0.0, 10.0, 2000)
        inside = ray_cast_contains(px, py, np.array(xs), np.array(ys))
        cells = cell_from_lonlat(px[inside], py[inside], res=res)
        assert not set(int(c) for c in cells) - exact
