"""Benchmark harness.

Runs the headline pipelines at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

    {"metric": "tiles_per_sec_full_pyramid", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": 0.1, ...}

The headline metric follows BASELINE.md: tiles/sec for the full
pyramid (burn -> downsample chain -> MD5 dedup -> PNG render), i.e.
the reference's ~13 tiles/s single-machine workload re-expressed on
Spark.  Scaling evidence (N vs 4N *executors*, per the north rule) is
produced by BENCH/scaling.py, which invokes this file on
local-cluster deployments at two executor counts
(SPARK_GRAFT_EXECUTORS; see session.py).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from pyspark.sql import functions as F

from gdal2mbtiles_spark.session import get_spark
from gdal2mbtiles_spark.grid import whole_world_raster_meta
from gdal2mbtiles_spark.operators.burn import burn_points
from gdal2mbtiles_spark.operators.pyramid import (dedup_tiles,
                                                  pyramid_tiles,
                                                  render_images,
                                                  union_levels)
from gdal2mbtiles_spark.operators import dedup as D
from gdal2mbtiles_spark.operators import similarity as S
from gdal2mbtiles_spark.operators.spatial import (knn_join,
                                                  point_in_polygon_join)
from gdal2mbtiles_spark.functions import text as T
from gdal2mbtiles_spark.renderers import PngRenderer
from gdal2mbtiles_spark.sources.pages import synth_pages, with_geo
from gdal2mbtiles_spark.sources.vectors import (polygons_df,
                                                query_points_df)

BURN_Z = int(os.environ.get("SPARK_GRAFT_BURN_Z", "10"))
#                    ^ 1024x1024 native tiles (~1.2M lit pyramid tiles)
PAGES_N = int(os.environ.get("SPARK_GRAFT_PAGES_N", "2000000"))
#                    ^ bench-scale synthetic pages (FIXTURES.md)
KNN_POINTS = 200_000
KNN_QUERIES = 200


def bench_pyramid(spark, sf_dir: str):
    """Headline: pages -> burn histogram -> sparse relational pyramid
    -> fused paint+hash+encode -> dedup.  (The sparse path is
    bit-identical to the buffer pipeline — tests/test_sparse.py — but
    shuffles only ~40-byte pixel rows.)"""
    from gdal2mbtiles_spark.operators.burn import pixel_histogram
    from gdal2mbtiles_spark.operators.sparse import \
        sparse_pyramid_rendered

    from gdal2mbtiles_spark.operators.sparse import _prof

    pages = with_geo(synth_pages(spark, PAGES_N), tile_z=BURN_Z)
    t0 = time.time()
    hist = pixel_histogram(pages, z=BURN_Z)
    images, map_df = sparse_pyramid_rendered(
        spark, hist, BURN_Z, PngRenderer(compression=1),
        min_resolution=0)
    tp = _prof("build_pipeline_total", t0)
    n_map = map_df.count()
    tp = _prof("map_count", tp)
    n_imgs, png_bytes = images.select(
        F.count("*"), F.sum(F.length("tile_data"))).first()
    _prof("images_agg", tp)
    dt = time.time() - t0
    return dt, n_map, n_imgs, int(png_bytes or 0)


def timed(fn, repeats: int = 3) -> float:
    """Best-of-N wall seconds.  The sandbox VM steals 10-15% CPU under
    load, so single samples of short queries are unreliable (round-1
    VERDICT: unexplained 16-core spikes); the first call also serves
    as the warm-up for JIT/broadcast caches."""
    best = None
    for _ in range(repeats):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(cores=cores, app="gdal2mbtiles_spark-bench",
                      shuffle_partitions=2 * cores)

    # the sf* parquet files are single-row-group (unsplittable), which
    # would serialize the CPU-heavy expression pipelines onto one task
    # — a local artifact a real multi-split table doesn't have.  One
    # explicit repartition restores realistic scan parallelism.
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(2 * cores).persist())
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .repartition(2 * cores).persist())
    docs.count()
    emb.count()

    queries = {}

    t, n_map, n_imgs, png_bytes = bench_pyramid(spark, sf_dir)
    queries["pyramid_full"] = round(t, 3)
    tiles_per_sec = n_map / t

    if os.environ.get("SPARK_GRAFT_BENCH_ONLY") == "pyramid":
        print(json.dumps({
            "metric": "tiles_per_sec_full_pyramid",
            "value": round(tiles_per_sec, 2), "unit": "sec",
            "queries": queries, "sf": sf, "cores": cores,
            "pyramid_tiles": n_map, "pyramid_images": n_imgs,
            "png_bytes": png_bytes}))
        spark.stop()
        return

    pages = with_geo(synth_pages(spark, PAGES_N)).persist()
    pages.count()

    polys = polygons_df(spark, 50)
    n_pip = point_in_polygon_join(pages, polys).count()
    queries["pip_join"] = timed(
        lambda: point_in_polygon_join(pages, polys).count())

    knn_pts = with_geo(synth_pages(spark, KNN_POINTS)).persist()
    knn_pts.count()
    knn_q = query_points_df(spark, KNN_QUERIES)
    n_knn = knn_join(knn_pts, knn_q, res=6).count()
    queries["knn_join"] = timed(
        lambda: knn_join(knn_pts, knn_q, res=6).count())

    queries["exact_dedup"] = timed(
        lambda: D.exact_dedup(docs.union(docs)).count())

    n_mh = D.minhash_lsh_pairs(docs).count()
    queries["minhash_lsh_pairs"] = timed(
        lambda: D.minhash_lsh_pairs(docs).count())

    queries["simhash_encode"] = timed(lambda: D.simhash(docs).count())
    queries["simhash_pairs"] = timed(
        lambda: D.simhash_pairs(docs).count())

    queries["ann_topk"] = timed(lambda: S.ann_topk_matmul(emb).count())
    queries["ann_topk_ivf"] = timed(lambda: S.ann_topk_ivf(emb).count())

    def _text_suite():
        T.quality_score(docs).count()
        T.lang_id(docs).count()
        T.token_counts(docs).count()

    queries["text_analysis"] = timed(_text_suite)

    out = {
        "metric": "tiles_per_sec_full_pyramid",
        "value": round(tiles_per_sec, 2),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cores": cores,
        "pyramid_tiles": n_map,
        "pyramid_images": n_imgs,
        "png_bytes": png_bytes,
        "pip_rows": n_pip,
        "knn_rows": n_knn,
        "minhash_pairs": n_mh,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
