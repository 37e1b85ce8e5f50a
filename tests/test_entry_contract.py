"""Driver-contract simulation: every queries() entry must match its
oracle_sql() twin (row set equality after column sort), mirroring the
driver's sf=0.01 correctness gate at sf=0.001 speed."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# the kernel-heavy pipeline queries are covered 1:1 in test_pyramid /
# test_spatial; exclude them here to keep the contract sweep fast
SLOW = {"pyramid_tile_counts", "knn_join",
        "extract_poly_stats", "pip_join"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_DIR}/{t}.parquet'")
    return con


def _assert_match(sdf, con, sql, name):
    a = sdf.toPandas()
    b = con.execute(sql).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols, (name, list(a.columns),
                                       list(b.columns))
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=name)


def test_every_query_has_callable_signature():
    qs = entry.queries()
    assert len(qs) >= 15
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_).issubset(set(qs))
    # round 3: every query carries an oracle — the approximate LSH
    # ops are gated via recall-check rows (exact side recomputed in
    # DuckDB, recall floor asserted as a literal)
    assert set(qs) == set(os_)


@pytest.mark.parametrize("name", sorted(
    set(entry.oracle_sql()) - SLOW))
def test_query_matches_oracle(spark, duck, name):
    sdf = entry.queries()[name](spark, SF_DIR)
    _assert_match(sdf, duck, entry.oracle_sql()[name], name)


def test_ann_lsh_recall(spark):
    """The approximate ANN must stay close to exact: recall@10 >= 0.6
    with 12 planes + 1-bit probing on sf0.001."""
    from gdal2mbtiles_spark.operators.similarity import (
        ann_topk_exact, ann_topk_lsh)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {(r["query_id"], r["vec_id"])
             for r in ann_topk_exact(emb).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in ann_topk_lsh(emb).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall


def test_embedding_neardup_lsh_recall(spark):
    """The LSH-bucketed near-dup must recover most of the blocked
    exact pairs at the same tau (same-label vectors are correlated in
    the fixture, so they collide in at least one table)."""
    from gdal2mbtiles_spark.operators.similarity import (
        embedding_neardup_lsh, embedding_neardup_pairs)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {(r["vec_a"], r["vec_b"])
             for r in embedding_neardup_pairs(emb, tau=0.3).collect()}
    approx = {(r["vec_a"], r["vec_b"])
              for r in embedding_neardup_lsh(emb, tau=0.3).collect()}
    assert exact, "fixture must produce exact pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall
    # every reported pair really is >= tau (no false positives on the
    # score itself — LSH only affects candidate generation)
    for r in embedding_neardup_lsh(emb, tau=0.3).collect():
        assert r["score"] >= 0.3


def test_ann_matmul_matches_exact(spark):
    from gdal2mbtiles_spark.operators.similarity import (
        ann_topk_exact, ann_topk_matmul)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {(r["query_id"], r["rank"], r["vec_id"])
             for r in ann_topk_exact(emb).collect()}
    fast = {(r["query_id"], r["rank"], r["vec_id"])
            for r in ann_topk_matmul(emb).collect()}
    assert exact == fast


def test_ann_ivf_recall_and_determinism(spark):
    """IVF scale path (coarse quantizer + nprobe probing): recall@10
    >= 0.6 vs exact, and the whole pipeline is deterministic — the
    quantizer trains on a vec_id-sorted hash-stride sample with RNG-
    free k-means, so two independent runs return identical rows (the
    correctness gate hashes depend on it)."""
    import numpy as np
    from gdal2mbtiles_spark.operators.similarity import (
        ann_topk_exact, ann_topk_ivf, ivf_centroids)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {(r["query_id"], r["vec_id"])
             for r in ann_topk_exact(emb).collect()}
    run1 = ann_topk_ivf(emb).collect()
    approx = {(r["query_id"], r["vec_id"]) for r in run1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall
    run2 = ann_topk_ivf(emb).collect()
    assert sorted(map(tuple, run1)) == sorted(map(tuple, run2))
    c1 = ivf_centroids(emb)
    c2 = ivf_centroids(emb)
    assert np.array_equal(c1, c2)
    # unit-norm centroids (spherical k-means invariant)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ann_ivf_probe_join_is_broadcast(spark):
    """The cluster equi-join must broadcast the bounded query side —
    a shuffled join here would move the full vector table on the
    cluster key for a 20-row probe list."""
    from gdal2mbtiles_spark.operators.similarity import ann_topk_ivf
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = ann_topk_ivf(emb)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    # the assign UDF must run ONCE over the big side: the coalesced
    # non-null join key folds away the injected isnotnull filter that
    # would otherwise evaluate the matmul UDF a second time
    assert plan.count("ArrowEvalPython [assign") == 1, plan[:2000]


def test_ann_lsh_plan_shape(spark):
    """LSH scale-path plan invariants: (a) the codes matmul runs once
    per scan — posexplode_OUTER keeps Catalyst from inferring a
    pre-explode size(codes)>0 filter that would plan the UDF twice per
    side; (b) the broadcast build side is the bounded query scan
    (vec_id < n_queries pushed to parquet), never the full table."""
    from gdal2mbtiles_spark.operators.similarity import (
        ann_topk_lsh, embedding_neardup_lsh)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    p1 = ann_topk_lsh(emb)._jdf.queryExecution().executedPlan().toString()
    assert p1.count("ArrowEvalPython [codes") == 2, \
        p1.count("ArrowEvalPython [codes")
    build = p1[p1.find("BroadcastExchange"):]
    assert "LessThan(vec_id,20)" in build, build[:1500]
    p2 = (embedding_neardup_lsh(emb)._jdf.queryExecution()
          .executedPlan().toString())
    assert p2.count("ArrowEvalPython [codes") == 1, \
        p2.count("ArrowEvalPython [codes")


def test_zero_embedding_rows_stay_finite(spark):
    """An all-zero embedding must not poison the matmul/IVF paths
    with NaN: it scores 0 against everything (deterministic last
    place) and gets a valid cluster assignment."""
    import math

    from pyspark.sql import functions as F

    from gdal2mbtiles_spark.operators.similarity import (
        DIM, ann_topk_ivf, ann_topk_matmul)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    zero = spark.createDataFrame(
        [(10_000_000, [0.0] * DIM)], "vec_id long, embedding array<float>")
    # keep the fixture's non-embedding columns out of the union
    both = emb.select("vec_id", "embedding").unionByName(zero)
    for df in (ann_topk_matmul(both), ann_topk_ivf(both)):
        rows = df.collect()
        assert rows
        for r in rows:
            assert r["score"] is not None
            assert math.isfinite(r["score"]), r
            # the zero vector can never be anyone's nearest neighbour
            # at positive similarity
            if r["vec_id"] == 10_000_000:
                assert r["score"] <= 0.0
