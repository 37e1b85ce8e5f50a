"""Spatial-join tests: PIP vs brute-force oracle, kNN ring join vs
cross-join baseline, extract vs histogram-side computation
(FIXTURES.md §4/§5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal2mbtiles_spark.operators.burn import burn_points
from gdal2mbtiles_spark.operators.spatial import (
    extract_poly_stats, knn_bruteforce, knn_join,
    point_in_polygon_join, ray_cast_contains)
from gdal2mbtiles_spark.sources.pages import synth_pages, with_geo
from gdal2mbtiles_spark.sources.vectors import (
    make_polygons, make_query_points, parse_polygon_wkb, polygon_wkb,
    polygons_df, query_points_df)

N_PAGES = 3000


@pytest.fixture(scope="module")
def geo_pages(spark):
    return with_geo(synth_pages(spark, N_PAGES)).persist()


class TestWkb:
    def test_round_trip(self):
        _, xs, ys = make_polygons(5)[3]
        wkb = polygon_wkb(xs, ys)
        bx, by = parse_polygon_wkb(wkb)
        assert np.array_equal(bx, np.array(xs))
        assert np.array_equal(by, np.array(ys))


class TestRayCast:
    def test_square(self):
        xs = np.array([0.0, 10.0, 10.0, 0.0])
        ys = np.array([0.0, 0.0, 10.0, 10.0])
        px = np.array([5.0, 15.0, -1.0, 9.99])
        py = np.array([5.0, 5.0, 5.0, 0.01])
        got = ray_cast_contains(px, py, xs, ys)
        assert got.tolist() == [True, False, False, True]

    def test_triangle(self):
        xs = np.array([0.0, 4.0, 2.0])
        ys = np.array([0.0, 0.0, 4.0])
        assert ray_cast_contains(np.array([2.0]), np.array([1.0]),
                                 xs, ys)[0]
        assert not ray_cast_contains(np.array([0.1]), np.array([3.9]),
                                     xs, ys)[0]


class TestPipJoin:
    def test_shuffle_path_matches_broadcast_path(self, spark,
                                                 geo_pages):
        # broadcast_polys=False is the 10^6-polygon path: no driver
        # collect, covers+vertices shuffle-join points on the cell key
        polys = polygons_df(spark, 50)
        a = {(r["url"], r["poly_id"])
             for r in point_in_polygon_join(geo_pages, polys)
             .collect()}
        b = {(r["url"], r["poly_id"])
             for r in point_in_polygon_join(
                 geo_pages, polys, broadcast_polys=False).collect()}
        assert a == b and len(a) > 0

    def test_salted_shuffle_path_bounds_hot_cell(self, spark):
        # north_rule: "explicit salted repartitioning on hot H3 cells".
        # Half the points collapse onto one cell (boilerplate city);
        # with n_salts the hot cell's candidates spread over many
        # reducers instead of one, rows identical.
        from gdal2mbtiles_spark.cells import cells_covering_bbox
        from gdal2mbtiles_spark.sources.pages import (
            SKEW_LAT, SKEW_LON, synth_pages_skewed, with_geo_skewed)

        pts = with_geo_skewed(
            synth_pages_skewed(spark, 4000, skew_fraction=0.5))
        xs = [SKEW_LON - 2, SKEW_LON + 2, SKEW_LON + 2, SKEW_LON - 2]
        ys = [SKEW_LAT - 2, SKEW_LAT - 2, SKEW_LAT + 2, SKEW_LAT + 2]
        cover = [int(c) for c in cells_covering_bbox(
            min(xs), min(ys), max(xs), max(ys))]
        polys = spark.createDataFrame(
            [(1, xs, ys, cover)],
            "poly_id int, xs array<double>, ys array<double>, "
            "cells array<long>")

        conf = spark.conf
        old_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
        old_aqe = conf.get("spark.sql.adaptive.enabled")
        # force a real shuffle join and keep reducer boundaries
        # observable (AQE would re-coalesce the tiny test partitions)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.enabled", "false")
        try:
            def max_task_rows(n_salts):
                out = point_in_polygon_join(
                    pts, polys, broadcast_polys=False,
                    n_salts=n_salts)
                dist = (out.withColumn("p", F.spark_partition_id())
                        .groupBy("p").count().collect())
                return (max(r["count"] for r in dist),
                        {(r2["url"], r2["poly_id"])
                         for r2 in out.collect()})

            hot_max, rows_plain = max_task_rows(1)
            salted_max, rows_salted = max_task_rows(8)
        finally:
            conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
            conf.set("spark.sql.adaptive.enabled", old_aqe)

        assert rows_plain == rows_salted and len(rows_plain) >= 1500
        # unsalted: every hot-cell candidate lands on ONE reducer;
        # salted: bounded by ~|hot|/n_salts (allow 2x hash slack)
        assert hot_max >= 1500
        assert salted_max <= hot_max / 2

    def test_auto_select_paths(self, spark, geo_pages):
        # VERDICT #4 done-criterion: broadcast_polys=None must pick a
        # path from the size estimate.  Under a tiny broadcast
        # threshold auto MUST take the shuffle path (no driver
        # collect) and still produce identical rows.
        polys = polygons_df(spark, 50)
        want = {(r["url"], r["poly_id"])
                for r in point_in_polygon_join(
                    geo_pages, polys, broadcast_polys=True).collect()}
        auto = {(r["url"], r["poly_id"])
                for r in point_in_polygon_join(geo_pages, polys)
                .collect()}
        assert auto == want
        conf = spark.conf
        old = conf.get("spark.sql.autoBroadcastJoinThreshold")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        try:
            forced_shuffle = {(r["url"], r["poly_id"])
                              for r in point_in_polygon_join(
                                  geo_pages, polys).collect()}
        finally:
            conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert forced_shuffle == want

    def test_matches_bruteforce(self, spark, geo_pages):
        polys = polygons_df(spark, 50)
        got = {(r["url"], r["poly_id"])
               for r in point_in_polygon_join(geo_pages, polys)
               .collect()}
        # brute force: every point against every polygon in numpy
        pts = geo_pages.select("url", "lon", "lat").collect()
        urls = np.array([r["url"] for r in pts])
        lons = np.array([r["lon"] for r in pts])
        lats = np.array([r["lat"] for r in pts])
        want = set()
        for p, xs, ys in make_polygons(50):
            inside = ray_cast_contains(lons, lats, np.array(xs),
                                       np.array(ys))
            for u in urls[inside]:
                want.add((u, p))
        assert got == want
        assert len(want) > 0  # the fixture actually exercises hits


class TestKnn:
    def test_ring_join_matches_bruteforce(self, spark, geo_pages):
        queries = query_points_df(spark, 60)
        got = {(r["query_id"], r["rank"], r["url"])
               for r in knn_join(geo_pages, queries, res=5).collect()}
        want = {(r["query_id"], r["rank"], r["url"])
                for r in knn_bruteforce(geo_pages, queries).collect()}
        assert got == want
        # every query got exactly k rows
        ks = {q: k for q, _, _, k in make_query_points(60)}
        from collections import Counter
        per_q = Counter(q for q, _, _ in got)
        assert per_q == {q: ks[q] for q in per_q}
        assert set(per_q) == set(ks)

    def test_polar_query_settles(self, spark, geo_pages):
        # near-pole query exercises the clipped-side guard
        q = spark.createDataFrame([(0, 10.0, 84.9, 5)],
                                  "query_id int, lon double, "
                                  "lat double, k int")
        got = knn_join(geo_pages, q, res=5).collect()
        want = knn_bruteforce(geo_pages, q).collect()
        assert ({(r["query_id"], r["rank"], r["url"]) for r in got}
                == {(r["query_id"], r["rank"], r["url"]) for r in want})

    def test_high_latitude_exact(self, spark, geo_pages):
        # regression (round-2 ADVICE): the parallel-arc horizontal
        # guard dLon*cos(lat) overestimates the distance to a meridian
        # edge at high latitude, allowing a premature settle that
        # misses a closer point just outside the ring; the great-circle
        # bound asin(sin(dLon)*cos(lat)) must keep kNN exact up there
        qs = spark.createDataFrame(
            [(i, float(lon), float(lat), 7)
             for i, (lon, lat) in enumerate(
                 [(0.5, 66.0), (44.9, 70.5), (-179.8, 61.0),
                  (120.1, 79.9), (-60.0, 66.6)])],
            "query_id int, lon double, lat double, k int")
        got = {(r["query_id"], r["rank"], r["url"])
               for r in knn_join(geo_pages, qs, res=5).collect()}
        want = {(r["query_id"], r["rank"], r["url"])
                for r in knn_bruteforce(geo_pages, qs).collect()}
        assert got == want

    def test_high_res_annulus_completes_and_exact(self, spark,
                                                  geo_pages):
        # res 9 (512x512 grid): the round-2 full-disk rebuild would
        # explode to (2*512+1)^2 ≈ 1.05M offsets per query on the
        # world-covering ring; the annulus + wrap-clamp path completes
        # and stays exact (VERDICT #3 done-criterion)
        qs = spark.createDataFrame(
            [(i, float(lon), float(lat), 5)
             for i, (lon, lat) in enumerate(
                 [(2.3, 48.8), (-170.0, -30.0), (100.0, 70.0),
                  (0.0, -84.0), (179.9, 0.1)])],
            "query_id int, lon double, lat double, k int")
        got = knn_join(geo_pages, qs, res=9, max_iters=12)
        rows = got.collect()
        assert all(r["settled"] for r in rows)
        assert ({(r["query_id"], r["rank"], r["url"]) for r in rows}
                == {(r["query_id"], r["rank"], r["url"])
                    for r in knn_bruteforce(geo_pages, qs).collect()})

    def test_terminal_flush_flagged_unsettled(self, spark, geo_pages):
        # max_iters too small to settle or cover the world: rows are
        # still emitted (best-effort) but flagged settled=False so
        # callers can detect inexactness (round-2 ADVICE)
        q = spark.createDataFrame([(0, 10.0, 10.0, 2000)],
                                  "query_id int, lon double, "
                                  "lat double, k int")
        rows = knn_join(geo_pages, q, res=6, max_iters=2).collect()
        assert rows and all(r["settled"] is False for r in rows)

    def test_no_persisted_rdds_leak(self, spark, geo_pages):
        # VERDICT round 1: remaining/pts/qbase persists were never
        # released; a kNN call must leave the cache where it found it
        # (+1 transient localCheckpoint for the returned result, which
        # we drop here before counting)
        import gc
        q = query_points_df(spark, 10)
        before = len(spark.sparkContext._jsc.getPersistentRDDs())
        out = knn_join(geo_pages, q, res=5)
        out.count()
        del out
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        import time
        for _ in range(20):
            after = len(spark.sparkContext._jsc.getPersistentRDDs())
            if after <= before:
                break
            time.sleep(0.5)
        assert after <= before + 1


class TestExtract:
    def test_shuffle_path_matches_broadcast(self, spark, geo_pages):
        # distributed covers (sequence+explode bbox tiling, verts
        # riding the rows, no driver collect) must equal the
        # broadcast path exactly — the 10^6-polygon J7 path
        z = 4
        tiles = burn_points(geo_pages, z=z)
        polys = polygons_df(spark, 20)
        a = {r["poly_id"]: (r["lit_pixels"], r["alpha_sum"])
             for r in extract_poly_stats(
                 tiles, polys, z, broadcast_polys=True).collect()}
        b = {r["poly_id"]: (r["lit_pixels"], r["alpha_sum"])
             for r in extract_poly_stats(
                 tiles, polys, z, broadcast_polys=False).collect()}
        assert a == b and len(a) > 0

    def test_alpha_sum_matches_point_side(self, spark, geo_pages):
        z = 4
        tiles = burn_points(geo_pages, z=z)
        polys = polygons_df(spark, 20)
        got = {r["poly_id"]: (r["lit_pixels"], r["alpha_sum"])
               for r in extract_poly_stats(tiles, polys, z).collect()}
        assert got, "no polygon covered any lit pixel"
        # oracle: recompute per-pixel heat from the histogram and
        # classify pixel centers in numpy
        from gdal2mbtiles_spark.operators.burn import pixel_histogram
        hist = pixel_histogram(geo_pages, z=z).collect()
        n = 1 << z
        lons, lats, ws = [], [], []
        for r in hist:
            lons.append(((r["x"] + (r["ppx"] + 0.5) / 256) / n) * 360
                        - 180)
            y_xyz = n - 1 - r["y"]
            yf = (y_xyz + (r["ppy"] + 0.5) / 256) / n
            t = np.pi * (1 - 2 * yf)
            lats.append(np.degrees(np.arctan(
                (np.exp(t) - np.exp(-t)) / 2.0)))
            ws.append(r["w"])
        lons, lats = np.array(lons), np.array(lats)
        alpha = np.maximum(np.minimum(
            255, (32.0 * np.log2(1.0 + np.array(ws))).astype(np.int64)),
            1)
        want = {}
        for p, xs, ys in make_polygons(20):
            inside = ray_cast_contains(lons, lats, np.array(xs),
                                       np.array(ys))
            if inside.any():
                want[p] = (int(inside.sum()),
                           int(alpha[inside].sum()))
        assert got == want


class TestAutoSalt:
    """Round-3 VERDICT #4: hot cells handled without the caller
    knowing — n_salts=None derives the salt count from a sampled
    candidate-cell histogram."""

    def _polys_one_hot(self, spark):
        from gdal2mbtiles_spark.cells import cells_covering_bbox
        from gdal2mbtiles_spark.sources.pages import SKEW_LAT, SKEW_LON
        xs = [SKEW_LON - 2, SKEW_LON + 2, SKEW_LON + 2, SKEW_LON - 2]
        ys = [SKEW_LAT - 2, SKEW_LAT - 2, SKEW_LAT + 2, SKEW_LAT + 2]
        cover = [int(c) for c in cells_covering_bbox(
            min(xs), min(ys), max(xs), max(ys))]
        return spark.createDataFrame(
            [(1, xs, ys, cover)],
            "poly_id int, xs array<double>, ys array<double>, "
            "cells array<long>")

    def test_skewed_fixture_picks_salts_uniform_picks_one(self, spark,
                                                          geo_pages):
        from gdal2mbtiles_spark.operators.spatial import _auto_salts
        from gdal2mbtiles_spark.sources.pages import (
            synth_pages_skewed, with_geo_skewed)

        polys = self._polys_one_hot(spark)
        poly_cells = polys.select(
            "poly_id", F.explode("cells").alias("cell"))

        hot = with_geo_skewed(
            synth_pages_skewed(spark, 4000, skew_fraction=0.5))
        n_hot = _auto_salts(hot.select("url", "lon", "lat", "cell"),
                            poly_cells, "cell", spark,
                            sample_fraction=1.0)
        assert n_hot > 1

        # uniform world-spread points over many polygons: no single
        # cell dominates, so auto must not salt
        polys50 = polygons_df(spark, 50)
        pc50 = polys50.select("poly_id",
                              F.explode("cells").alias("cell"))
        n_uni = _auto_salts(
            geo_pages.select("url", "lon", "lat", "cell"), pc50,
            "cell", spark, sample_fraction=1.0)
        assert n_uni == 1

    def test_auto_salted_rows_identical(self, spark):
        # end-to-end: auto (None) vs forced n_salts=1 produce the same
        # pairs on the skewed fixture through the shuffle path
        from gdal2mbtiles_spark.sources.pages import (
            synth_pages_skewed, with_geo_skewed)
        pts = with_geo_skewed(
            synth_pages_skewed(spark, 4000, skew_fraction=0.5))
        polys = self._polys_one_hot(spark)
        plain = {(r["url"], r["poly_id"])
                 for r in point_in_polygon_join(
                     pts, polys, broadcast_polys=False,
                     n_salts=1).collect()}
        auto = {(r["url"], r["poly_id"])
                for r in point_in_polygon_join(
                    pts, polys, broadcast_polys=False,
                    salt_sample_fraction=1.0).collect()}
        assert auto == plain and len(plain) >= 1500


class TestAutoKnnRes:
    def test_res_scales_with_density(self):
        from gdal2mbtiles_spark.operators.spatial import _auto_knn_res
        assert _auto_knn_res(500) == 1          # sparse: coarse grid
        dense = _auto_knn_res(500_000)
        assert dense > _auto_knn_res(500)
        # 10^12 points: ~4^res cells targeting ~2e3/cell, capped
        assert _auto_knn_res(10**12) == 15
        assert _auto_knn_res(10**15) == 16      # cap

    def test_estimate_count_partial_scan(self, spark):
        # round-4 VERDICT #4: the auto-res estimate must NOT be a full
        # scan.  An accumulator tap counts rows actually materialized:
        # with 64 partitions and max_parts=16 at most a quarter of the
        # rows may be read, yet the estimate lands within 25%.
        from gdal2mbtiles_spark.operators.spatial import estimate_count
        total = 40_000
        acc = spark.sparkContext.accumulator(0)

        def tap(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        base = (spark.range(total).repartition(64)
                .mapInPandas(tap, schema="id long"))
        est = estimate_count(base, max_parts=16)
        assert acc.value < total // 2, acc.value     # partial scan
        assert abs(est - total) <= total // 4, est   # usable estimate

    def test_estimate_count_exact_when_few_partitions(self, spark):
        from gdal2mbtiles_spark.operators.spatial import estimate_count
        df = spark.range(1234).repartition(8)
        assert estimate_count(df, max_parts=16) == 1234

    def test_auto_res_exact_dense_and_sparse(self, spark, geo_pages):
        # auto res (None) must stay exact vs brute force on both a
        # dense and a sparse points side, picking different grids
        queries = query_points_df(spark, 30)
        sparse_pts = geo_pages.limit(400)
        for pts in (geo_pages, sparse_pts):
            got = {(r["query_id"], r["rank"], r["url"])
                   for r in knn_join(pts, queries).collect()}
            want = {(r["query_id"], r["rank"], r["url"])
                    for r in knn_bruteforce(pts, queries).collect()}
            assert got == want


class TestIdTypeAndCellExactness:
    """Round-5 review regressions: exact integer cell unpacking at
    high res, and id-type preservation across plan choices."""

    def test_cell_xy_exact_at_max_res(self, spark):
        # long/long `/` evaluates in double and rounds above 2^53;
        # shiftright is exact for every res up to MAX_RES=29
        from gdal2mbtiles_spark.cells import pack_cell
        from gdal2mbtiles_spark.operators.spatial import _cell_xy
        res = 29
        n = 1 << res
        xs = np.array([0, 1, n - 1, n // 2, (1 << 24) + 12345],
                      dtype=np.int64)
        ys = np.array([0, n - 1, n - 1, n // 3, n - 1],
                      dtype=np.int64)
        df = spark.createDataFrame(
            [(int(c),) for c in pack_cell(xs, ys, res)], "cell long")
        cx, cy = _cell_xy(F.col("cell"), res)
        got = [(r["x"], r["y"])
               for r in df.select(cx.alias("x"), cy.alias("y"))
               .collect()]
        assert got == list(zip(xs.tolist(), ys.tolist()))

    def test_pip_string_ids_both_paths(self, spark, geo_pages):
        # the broadcast plan used int(poly_id) and crashed on string
        # ids the shuffle plan handled — behaviour must not flip with
        # the auto size estimate
        polys = polygons_df(spark, 20).withColumn(
            "poly_id", F.concat(F.lit("poly-"), F.col("poly_id")))
        a = {(r["url"], r["poly_id"])
             for r in point_in_polygon_join(
                 geo_pages, polys, broadcast_polys=True).collect()}
        b = {(r["url"], r["poly_id"])
             for r in point_in_polygon_join(
                 geo_pages, polys, broadcast_polys=False).collect()}
        assert a == b and len(a) > 0
        assert all(p.startswith("poly-") for _, p in a)

    def test_extract_bigint_ids_both_paths(self, spark, geo_pages):
        # extract hardcoded poly_id to int32; 64-bit ids overflowed
        # np.full / the int schema — both paths must preserve bigint
        from gdal2mbtiles_spark.operators.burn import burn_points
        z = 6
        polys = polygons_df(spark, 8).withColumn(
            "poly_id",
            (F.col("poly_id").cast("bigint")
             + F.lit(3_000_000_000).cast("bigint")))
        tiles = burn_points(geo_pages, z)
        a = {(r["poly_id"], r["lit_pixels"], r["alpha_sum"])
             for r in extract_poly_stats(
                 tiles, polys, z=z, broadcast_polys=True).collect()}
        b = {(r["poly_id"], r["lit_pixels"], r["alpha_sum"])
             for r in extract_poly_stats(
                 tiles, polys, z=z, broadcast_polys=False).collect()}
        assert a == b and len(a) > 0
        assert all(p >= 3_000_000_000 for p, _, _ in a)
