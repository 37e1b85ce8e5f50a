"""Skew operators, band extract, png8 palette encoding."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal2mbtiles_spark.operators.bands import band_to_rgba, extract_band
from gdal2mbtiles_spark.operators.skew import (hot_keys,
                                               salted_repartition,
                                               two_phase_agg, with_salt)
from gdal2mbtiles_spark.renderers import (PngRenderer, decode_png_rgba,
                                          encode_png8)
from gdal2mbtiles_spark.sources.pages import (synth_pages_skewed,
                                              with_geo_skewed)


class TestSkew:
    def test_salt_deterministic_and_bounded(self, spark):
        df = spark.range(10_000).select(
            (F.col("id") % 3).alias("k"), F.col("id").alias("v"))
        a = with_salt(df, n_salts=8).select("v", "_salt").collect()
        b = with_salt(df.repartition(13), n_salts=8).select(
            "v", "_salt").collect()
        assert {(r["v"], r["_salt"]) for r in a} == \
            {(r["v"], r["_salt"]) for r in b}
        salts = {r["_salt"] for r in a}
        assert salts <= set(range(8)) and len(salts) > 1

    def test_two_phase_agg_equals_direct(self, spark):
        # a pathologically hot key: 90% of rows on one key
        df = spark.range(20_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 7).alias("k"),
            (F.col("id") % 100).cast("double").alias("v"))
        direct = {(r["k"], r["s"], r["n"]) for r in
                  df.groupBy("k").agg(F.sum("v").alias("s"),
                                      F.count("*").alias("n"))
                  .collect()}
        salted = {(r["k"], r["s"], r["n"]) for r in two_phase_agg(
            df, ["k"],
            aggs=[F.sum("v").alias("ps"), F.count("*").alias("pn")],
            merge=[F.sum("ps").alias("s"), F.sum("pn").alias("n")],
        ).collect()}
        assert direct == salted

    def test_salted_repartition_spreads_hot_key(self, spark):
        df = spark.range(8_000).select(F.lit(1).alias("k"),
                                       F.col("id").alias("v"))
        out = salted_repartition(df, ["k"], n_partitions=16, n_salts=16)
        sizes = (out.withColumn("p", F.spark_partition_id())
                 .groupBy("p").count().collect())
        # the single hot key lands on many partitions, none holding all
        assert len(sizes) > 4
        assert max(r["count"] for r in sizes) < 8_000

    def test_hot_keys_detects_skewed_pages(self, spark):
        pages = with_geo_skewed(synth_pages_skewed(spark, 5_000))
        hot = hot_keys(pages, ["cell"], threshold=500).collect()
        assert len(hot) == 1  # the forced cluster cell
        assert hot[0]["count"] > 1_000

    def test_skewed_burn_matches_unsalted_histogram(self, spark):
        # burn's pixel histogram handles the hot cell structurally:
        # totals must be exact despite 30% of rows on one pixel
        from gdal2mbtiles_spark.operators.burn import pixel_histogram
        pages = with_geo_skewed(synth_pages_skewed(spark, 5_000))
        hist = pixel_histogram(pages, z=7)
        assert hist.agg(F.sum("w")).first()[0] == 5_000
        top = hist.orderBy(F.col("w").desc()).first()
        assert top["w"] > 1_000  # the hot pixel exists and is exact


class TestBands:
    def test_extract_band_round_trip(self, spark):
        arr = np.zeros((256, 256, 4), np.uint8)
        arr[..., 0] = 10
        arr[..., 1] = 20
        arr[..., 2] = 30
        arr[..., 3] = 255
        df = spark.createDataFrame(
            [(2, 1, 1, bytearray(arr.tobytes()))],
            "z int, x bigint, y bigint, px binary")
        g = extract_band(df, band=2).collect()[0]
        v = np.frombuffer(bytes(g["px"]), np.uint8)
        assert v.shape == (256 * 256,) and (v == 20).all()
        back = band_to_rgba(extract_band(df, band=3)).collect()[0]
        rgba = np.frombuffer(bytes(back["px"]), np.uint8).reshape(-1, 4)
        assert (rgba[:, 0] == 30).all() and (rgba[:, 3] == 255).all()

    def test_extract_band_validates(self, spark):
        df = spark.createDataFrame([], "z int, x bigint, y bigint, "
                                       "px binary")
        with pytest.raises(ValueError):
            extract_band(df, band=0)


class TestPng8:
    def _tile(self):
        arr = np.zeros((256, 256, 4), np.uint8)
        arr[:128] = (255, 0, 0, 255)
        arr[128:] = (0, 0, 255, 128)
        return arr

    def test_exact_palette_round_trip(self):
        arr = self._tile()
        png = encode_png8(arr.tobytes())
        assert b"PLTE" in png and b"tRNS" in png
        back = decode_png_rgba(png)
        assert np.array_equal(back, arr)

    def test_renderer_png8_smaller(self):
        arr = self._tile()
        full = PngRenderer().render(arr.tobytes())
        pal = PngRenderer(png8=256).render(arr.tobytes())
        assert len(pal) < len(full)
        assert np.array_equal(decode_png_rgba(pal), arr)

    def test_quantizes_when_too_many_colors(self):
        rng = np.arange(256 * 256, dtype=np.uint32)
        arr = np.zeros((256 * 256, 4), np.uint8)
        arr[:, 0] = rng % 256
        arr[:, 1] = (rng // 256) % 256
        arr[:, 3] = 255
        png = encode_png8(arr.tobytes(), max_colors=256)
        back = decode_png_rgba(png)
        # posterized: at most 256 distinct colors, close to original
        uniq = len(np.unique(back.reshape(-1, 4).view(np.uint32)))
        assert uniq <= 256
        diff = np.abs(back.reshape(-1, 4)[:, :3].astype(int)
                      - arr[:, :3].astype(int))
        assert diff.max() <= 64

    def test_png8_range_validation(self):
        with pytest.raises(ValueError):
            encode_png8(self._tile().tobytes(), max_colors=1)
