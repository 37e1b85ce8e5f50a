"""Sparse relational pyramid: equivalence with the buffer pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal2mbtiles_spark.grid import whole_world_raster_meta
from gdal2mbtiles_spark.operators.burn import (burn_points,
                                               pixel_histogram)
from gdal2mbtiles_spark.operators.pyramid import (dedup_tiles,
                                                  pyramid_tiles,
                                                  render_images,
                                                  union_levels)
from gdal2mbtiles_spark.operators.sparse import (downsample_pixels,
                                                 heat_pixels,
                                                 sparse_levels,
                                                 sparse_pyramid_rendered)
from gdal2mbtiles_spark.renderers import PngRenderer, decode_png_rgba
from gdal2mbtiles_spark.sources.pages import synth_pages, with_geo

Z = 4
N = 3000


@pytest.fixture(scope="module")
def hist(spark):
    pages = with_geo(synth_pages(spark, N), tile_z=Z)
    return pixel_histogram(pages, z=Z).persist()


def test_sparse_equals_buffer_pipeline(spark, hist):
    # buffer path: burn -> pyramid -> dedup (raw) -> render
    tiles = hist.sparkSession  # noqa (fixture ordering)
    from gdal2mbtiles_spark.operators.burn import scatter_tiles
    buf_tiles = scatter_tiles(hist)
    meta = whole_world_raster_meta(256 * (1 << Z), 256 * (1 << Z))
    levels = pyramid_tiles(spark, buf_tiles, meta, min_resolution=0)
    b_images, b_map = dedup_tiles(spark, union_levels(levels))
    b_map_rows = {(r["zoom_level"], r["tile_column"], r["tile_row"],
                   r["tile_id"]) for r in b_map.collect()}
    b_hexes = {r["tile_hex"] for r in b_images.collect()}

    # sparse fused path
    s_images, s_map = sparse_pyramid_rendered(
        spark, hist, Z, PngRenderer(compression=1), min_resolution=0)
    s_map_rows = {(r["zoom_level"], r["tile_column"], r["tile_row"],
                   r["tile_id"]) for r in s_map.collect()}
    s_img = {r["tile_hex"]: bytes(r["tile_data"])
             for r in s_images.collect()}

    assert s_map_rows == b_map_rows          # identical tile content
    assert set(s_img) == b_hexes             # identical distinct images
    # payloads are valid PNGs decoding to 256x256 RGBA
    arr = decode_png_rgba(next(iter(s_img.values())))
    assert arr.shape == (256, 256, 4)


def test_multi_phase_equals_single_phase(spark, hist):
    # phase_depth=2 forces the emit_pixels bridge (3 kernel passes at
    # Z=4); results must be identical to one deep pass
    one = sparse_pyramid_rendered(spark, hist, Z,
                                  PngRenderer(compression=1),
                                  min_resolution=0, phase_depth=16,
                                  apex_level=0)
    many = sparse_pyramid_rendered(spark, hist, Z,
                                   PngRenderer(compression=1),
                                   min_resolution=0, phase_depth=2,
                                   apex_level=2)
    for a, b in zip(one, many):
        ra = sorted(tuple(bytes(v) if isinstance(v, (bytes, bytearray))
                          else v for v in row) for row in a.collect())
        rb = sorted(tuple(bytes(v) if isinstance(v, (bytes, bytearray))
                          else v for v in row) for row in b.collect())
        assert ra == rb


def test_canon_paths_identical(spark, hist):
    # force the broadcast-join canon and the min_by-aggregate canon
    # (the at-scale fallback when the distinct-image relation would
    # not fit a broadcast): identical (images, map) rows
    a = sparse_pyramid_rendered(spark, hist, Z,
                                PngRenderer(compression=1),
                                min_resolution=0, broadcast_canon=True)
    b = sparse_pyramid_rendered(spark, hist, Z,
                                PngRenderer(compression=1),
                                min_resolution=0, broadcast_canon=False)
    for da, db in zip(a, b):
        ra = sorted(tuple(bytes(v) if isinstance(v, (bytes, bytearray))
                          else v for v in row) for row in da.collect())
        rb = sorted(tuple(bytes(v) if isinstance(v, (bytes, bytearray))
                          else v for v in row) for row in db.collect())
        assert ra == rb


def test_canon_auto_select_falls_back_under_tiny_threshold(spark,
                                                           hist):
    # force the auto estimator over the broadcast limit: it must take
    # the min_by aggregate (the at-scale plan) and match the
    # broadcast output exactly
    want_imgs, _ = sparse_pyramid_rendered(
        spark, hist, Z, PngRenderer(compression=1), min_resolution=0,
        broadcast_canon=True)
    want = {r["tile_hex"] for r in want_imgs.collect()}
    conf = spark.conf
    old = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
    try:
        auto_imgs, _ = sparse_pyramid_rendered(
            spark, hist, Z, PngRenderer(compression=1),
            min_resolution=0)
        got = {r["tile_hex"] for r in auto_imgs.collect()}
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == want


def test_canon_auto_select_small_broadcasts(spark, hist):
    # at test scale the distinct-image count is tiny: auto (None) must
    # pick the broadcast plan and match the forced-broadcast output
    auto_imgs, _ = sparse_pyramid_rendered(
        spark, hist, Z, PngRenderer(compression=1), min_resolution=0)
    forced_imgs, _ = sparse_pyramid_rendered(
        spark, hist, Z, PngRenderer(compression=1), min_resolution=0,
        broadcast_canon=True)
    assert ({r["tile_hex"] for r in auto_imgs.collect()}
            == {r["tile_hex"] for r in forced_imgs.collect()})


def test_downsample_pixels_box_semantics(spark):
    # 4 children of one parent pixel with known alphas
    rows = [(3, 10, 10, 255, 255, 255, 100),
            (3, 11, 10, 255, 255, 255, 50),
            (3, 10, 11, 255, 255, 255, 25),
            (3, 11, 11, 255, 255, 255, 11)]
    df = spark.createDataFrame(
        rows, "z int, gx bigint, gy bigint, r int, g int, b int, a int")
    out = downsample_pixels(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["gx"], r["gy"]) == (5, 5)
    assert r["a"] == (100 + 50 + 25 + 11 + 2) // 4
    assert r["r"] == (255 * 4 + 2) // 4  # saturated white stays 255

    # partial parent: 1 lit child only -> other three contribute 0
    df2 = spark.createDataFrame(
        [(3, 20, 20, 255, 255, 255, 200)],
        "z int, gx bigint, gy bigint, r int, g int, b int, a int")
    r2 = downsample_pixels(df2).collect()[0]
    assert r2["a"] == (200 + 2) // 4
    assert r2["r"] == (255 + 2) // 4


def test_sparse_levels_decay(spark, hist):
    levels = sparse_levels(hist, Z, min_resolution=0)
    counts = {z: levels[z].count() for z in levels}
    # sparse row counts can only shrink (or stay) per level
    for z in range(Z, 0, -1):
        assert counts[z - 1] <= counts[z]
    assert counts[0] >= 1


def test_pixel_batch_conf_restores_unset_key(spark):
    """__exit__ must UNSET the Arrow batch key when the session never
    set it explicitly (conf.get(key, None) -> None), not leak the
    raised pixel batch size onto tile-buffer kernels."""
    from gdal2mbtiles_spark.operators.sparse import (_ARROW_BATCH_KEY,
                                                     _pixel_batch_conf)
    orig = spark.conf.get(_ARROW_BATCH_KEY, None)
    try:
        spark.conf.unset(_ARROW_BATCH_KEY)
        with _pixel_batch_conf(spark):
            assert spark.conf.get(_ARROW_BATCH_KEY) == "65536"
        assert spark.conf.get(_ARROW_BATCH_KEY, None) is None
        # and the set-restore path still round-trips
        spark.conf.set(_ARROW_BATCH_KEY, "256")
        with _pixel_batch_conf(spark):
            assert spark.conf.get(_ARROW_BATCH_KEY) == "65536"
        assert spark.conf.get(_ARROW_BATCH_KEY, None) == "256"
    finally:
        if orig is None:
            spark.conf.unset(_ARROW_BATCH_KEY)
        else:
            spark.conf.set(_ARROW_BATCH_KEY, orig)


def test_min_resolution_final_phase_is_materialized(spark, hist):
    """min_resolution == the final phase's bottom makes that phase
    emit=False; it must still be checkpointed (otherwise the fused
    kernel re-executes per consumer) and the unused apex seed must
    not be materialized.  Output parity with the full pyramid's
    matching levels is the correctness half."""
    from gdal2mbtiles_spark.operators.sparse import \
        sparse_pyramid_rendered
    images, map_df = sparse_pyramid_rendered(
        spark, hist, 6, PngRenderer(compression=1), min_resolution=5)
    # consumers read checkpointed blocks — no pandas kernel in the
    # executed plan of either output
    for df in (images, map_df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" not in plan, plan[:2000]
    got = {(r["zoom_level"], r["tile_column"], r["tile_row"],
            r["tile_id"]) for r in map_df.collect()}
    assert {z for z, *_ in got} == {5, 6}
    _full_images, full_map = sparse_pyramid_rendered(
        spark, hist, 6, PngRenderer(compression=1), min_resolution=0)
    want = {(r["zoom_level"], r["tile_column"], r["tile_row"],
             r["tile_id"])
            for r in full_map.collect() if r["zoom_level"] >= 5}
    assert got == want
