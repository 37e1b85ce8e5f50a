"""Burn operator tests (J7): pixel histogram + scatter."""

import numpy as np
from pyspark.sql import functions as F

from gdal2mbtiles_spark.operators.burn import (burn_points,
                                               pixel_histogram)
from gdal2mbtiles_spark.operators.pyramid import (dedup_tiles,
                                                  downsample_level)
from gdal2mbtiles_spark.sources.pages import synth_pages, with_geo


def test_single_point_single_pixel(spark):
    pts = spark.createDataFrame([(0.1, 0.1)], "lon double, lat double")
    tiles = burn_points(pts, z=2).collect()
    assert len(tiles) == 1
    t = tiles[0]
    # lon/lat slightly NE of center: XYZ tile (2,1) -> TMS (2, 2)
    assert (t["z"], t["x"], t["y"]) == (2, 2, 2)
    arr = np.frombuffer(bytes(t["px"]), np.uint8).reshape(256, 256, 4)
    nz = np.argwhere(arr[:, :, 3] > 0)
    assert len(nz) == 1
    # the hit pixel is near the tile's bottom-left (just past center)
    py, px = nz[0]
    assert px < 2 and py > 253


def test_weights_accumulate(spark):
    # 300 identical points -> one pixel with alpha from w=300
    pts = spark.createDataFrame([(10.0, 20.0)] * 300,
                                "lon double, lat double")
    tiles = burn_points(pts, z=1).collect()
    assert len(tiles) == 1
    arr = np.frombuffer(bytes(tiles[0]["px"]), np.uint8).reshape(
        256, 256, 4)
    alphas = arr[arr[:, :, 3] > 0][:, 3]
    assert len(alphas) == 1
    want = min(255, int(32 * np.log2(1.0 + 300.0)))
    assert alphas[0] == want


def test_histogram_counts(spark):
    pts = synth_pages(spark, 2000)
    pts = with_geo(pts, tile_z=3)
    hist = pixel_histogram(pts, z=3)
    # total weight equals row count
    total = hist.agg(F.sum("w")).collect()[0][0]
    assert total == 2000
    # tile keys in hist match the with_geo derivation
    hkeys = {(r["x"], r["y"]) for r in
             hist.select("x", "y").distinct().collect()}
    gkeys = {(r["tile_x"], r["tile_y"]) for r in
             pts.select("tile_x", "tile_y").distinct().collect()}
    assert hkeys == gkeys


def test_burn_feeds_pyramid_and_dedup(spark):
    pts = with_geo(synth_pages(spark, 1000), tile_z=2)
    tiles = burn_points(pts, z=2)
    parents = downsample_level(tiles)
    assert parents.count() <= 4
    images, map_df = dedup_tiles(spark, tiles)
    assert images.count() <= map_df.count() == tiles.count()


def test_determinism_across_parallelism(spark):
    # identical output regardless of partitioning (N vs 4N invariance)
    pts = with_geo(synth_pages(spark, 500), tile_z=3)
    a = burn_points(pts.repartition(2), z=3)
    b = burn_points(pts.repartition(16), z=3)
    da = {(r["z"], r["x"], r["y"]): bytes(r["px"]) for r in a.collect()}
    db = {(r["z"], r["x"], r["y"]): bytes(r["px"]) for r in b.collect()}
    assert da == db
