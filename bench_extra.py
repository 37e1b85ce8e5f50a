"""Extra benchmarks (guide §1.4): per-query noop-sink isolation and
.explain("formatted") capture.  bench.py is FROZEN for measurement;
this file exists so optimization evidence (plan shapes, isolated
timings) can be produced without touching it.

Usage:
    python bench_extra.py plans <outdir>     # capture explain() per query
    python bench_extra.py time [query ...]   # noop-sink best-of-3 seconds
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from gdal2mbtiles_spark.session import get_spark
from gdal2mbtiles_spark.operators import dedup as D
from gdal2mbtiles_spark.operators import similarity as S
from gdal2mbtiles_spark.operators.spatial import (knn_join,
                                                  point_in_polygon_join)
from gdal2mbtiles_spark.functions import text as T
from gdal2mbtiles_spark.sources.pages import synth_pages, with_geo
from gdal2mbtiles_spark.sources.vectors import (polygons_df,
                                                query_points_df)

PAGES_N = int(os.environ.get("SPARK_GRAFT_PAGES_N", "2000000"))
KNN_POINTS = 200_000
KNN_QUERIES = 200


def _setup():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cores, app="gdal2mbtiles_spark-bench-extra",
                      shuffle_partitions=2 * cores)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(2 * cores).persist())
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .repartition(2 * cores).persist())
    docs.count()
    emb.count()
    return spark, docs, emb


def _queries(spark, docs, emb):
    pages = with_geo(synth_pages(spark, PAGES_N)).persist()
    pages.count()
    polys = polygons_df(spark, 50)
    knn_pts = with_geo(synth_pages(spark, KNN_POINTS)).persist()
    knn_pts.count()
    knn_q = query_points_df(spark, KNN_QUERIES)
    return {
        "pip_join": lambda: point_in_polygon_join(pages, polys),
        "knn_join": lambda: knn_join(knn_pts, knn_q, res=6),
        "exact_dedup": lambda: D.exact_dedup(docs.union(docs)),
        "minhash_lsh_pairs": lambda: D.minhash_lsh_pairs(docs),
        "simhash_encode": lambda: D.simhash(docs),
        "simhash_pairs": lambda: D.simhash_pairs(docs),
        "ann_topk": lambda: S.ann_topk_matmul(emb),
        "ann_topk_ivf": lambda: S.ann_topk_ivf(emb),
        "text_quality": lambda: T.quality_score(docs),
        "text_lang": lambda: T.lang_id(docs),
        "text_tokens": lambda: T.token_counts(docs),
    }


def capture_plans(outdir: str, suffix: str = "before"):
    os.makedirs(outdir, exist_ok=True)
    spark, docs, emb = _setup()
    qs = _queries(spark, docs, emb)
    import contextlib
    import io

    for name, fn in qs.items():
        df = fn()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


def time_queries(names=None, repeats=3):
    spark, docs, emb = _setup()
    qs = _queries(spark, docs, emb)
    out = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        best = None
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bx:{name}")
            t0 = time.time()
            (fn().write.format("noop").mode("overwrite").save())
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "plans":
        outdir = sys.argv[2] if len(sys.argv) > 2 else "plans/r06"
        suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
        capture_plans(outdir, suffix)
    else:
        time_queries(set(sys.argv[2:]) or None)
