"""warp_* compositions + nested-file sink (reference helpers.py
warp_mbtiles/warp_pyramid/image_pyramid golden shapes)."""

import os
import sqlite3

import numpy as np
import pytest

from gdal2mbtiles_spark.grid import RasterMeta, SRS_MERCATOR
from gdal2mbtiles_spark.helpers import (image_pyramid, warp_mbtiles,
                                        warp_plan)
from gdal2mbtiles_spark.operators.resample import blocks_from_array
from gdal2mbtiles_spark.sources.rasters import native_tiles
from gdal2mbtiles_spark.grid import whole_world_raster_meta

HALF = SRS_MERCATOR.major_circumference() / 2


def spanning_blocks(spark):
    px = HALF / 512  # z2 pixel
    meta = RasterMeta(412, 412, (-HALF + 50 * px, px, 0.0,
                                 -50 * px, 0.0, -px))
    img = np.zeros((412, 412, 4), np.uint8)
    img[..., 1] = 200
    img[..., 3] = 255
    return blocks_from_array(spark, img), meta


class TestWarpPlan:
    def test_unaligned_input_becomes_native_tiles(self, spark):
        blocks, meta = spanning_blocks(spark)
        tiles, meta2 = warp_plan(spark, blocks, meta)
        keys = {(r["z"], r["x"], r["y"])
                for r in tiles.select("z", "x", "y").collect()}
        # SW quadrant of the z2 world
        assert keys == {(2, x, y) for x in range(2) for y in range(2)}
        assert (meta2.xsize, meta2.ysize) == (512, 512)


class TestWarpMbtiles:
    def test_end_to_end(self, spark, tmp_path):
        blocks, meta = spanning_blocks(spark)
        out = str(tmp_path / "warp.mbtiles")
        f = warp_mbtiles(
            spark, blocks, meta, out,
            metadata=dict(name="w", type="overlay", version="1",
                          description="d", format="png"),
            min_resolution=0, fill_borders=True)
        f.close()
        c = sqlite3.connect(out)
        counts = dict(c.execute(
            "SELECT zoom_level, count(*) FROM tiles GROUP BY 1"))
        assert counts == {0: 1, 1: 4, 2: 16}
        md = dict(c.execute("SELECT name, value FROM metadata"))
        # tiled extents of the spanning raster round outward in the
        # 4326 grid -> the SW quadrant (cf. the reference's aligned
        # golden `-90.0,-90.0,0.0,0.0`, tests/test_helpers.py:47-52)
        assert md["bounds"] == "-180.0,-90.0,0.0,0.0"


class TestImagePyramidSink:
    def test_nested_layout(self, spark, tmp_path):
        meta = whole_world_raster_meta(512, 512)
        tiles = native_tiles(spark, meta)
        outdir = str(tmp_path / "pyr")
        image_pyramid(spark, tiles, meta, outdir, min_resolution=0,
                      fill_borders=False)
        files = []
        for root, _, names in os.walk(outdir):
            for n in names:
                files.append(os.path.relpath(os.path.join(root, n),
                                             outdir))
        assert sorted(files) == sorted(
            ["0/0/0.png"] + [f"1/{x}/{y}.png" for x in range(2)
                             for y in range(2)])
