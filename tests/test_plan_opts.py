"""Round-6 session-2 plan-shape contracts.

1. The banded-pair machinery (dedup._grouped_pairs) pins its
   pair-generation parallelism with a keyed REPARTITION_BY_NUM
   exchange: without it AQE's byte-based coalescing packs the tiny
   grouped-signature exchange — and therefore the cap^2/2-per-key
   pair EXPLOSION that follows it — onto a single task.
2. The vector fixtures (polygons_df / query_points_df) plan as local
   Arrow relations, not Python RDDs: a Scan ExistingRDD side is
   re-evaluated through a Python-worker wave by every action of every
   consumer, and its values still bit-match the driver-side source
   the DuckDB oracle inlines.
"""

import io
from contextlib import redirect_stdout

from gdal2mbtiles_spark.operators import dedup as D
from gdal2mbtiles_spark.sources.pages import synth_pages
from gdal2mbtiles_spark.sources.vectors import (make_polygons,
                                                make_query_points,
                                                polygons_df,
                                                query_points_df)


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestGroupedPairsParallelism:
    def test_pair_exchange_is_pinned(self, spark):
        docs = synth_pages(spark, 200).selectExpr(
            "cast(xxhash64(url) as bigint) as doc_id", "text")
        plan = _formatted_plan(D.simhash_pairs(docs))
        pinned = [ln for ln in plan.splitlines()
                  if "REPARTITION_BY_NUM" in ln
                  and "chunk" in ln]
        assert pinned, (
            "expected a keyed REPARTITION_BY_NUM exchange on the "
            "(chunk_idx, chunk) pair keys; without it AQE serializes "
            "the pair explosion onto one task:\n" + plan)
        # the pinned repartition must REPLACE the window/group
        # exchange, not add one: exactly one hashpartitioning
        # exchange on the chunk keys in the whole plan
        chunk_exchanges = [ln for ln in plan.splitlines()
                           if "hashpartitioning(chunk_idx" in ln]
        assert len(chunk_exchanges) == 1, plan

    def test_parallelism_derived_not_constant(self, spark):
        # the pin must track the session's parallelism, never a
        # hard-coded local count
        docs = synth_pages(spark, 50).selectExpr(
            "cast(xxhash64(url) as bigint) as doc_id", "text")
        plan = _formatted_plan(D.simhash_pairs(docs))
        n = spark.sparkContext.defaultParallelism
        assert f"chunk#" in plan and f", {n})" in "".join(
            ln for ln in plan.splitlines()
            if "REPARTITION_BY_NUM" in ln)


class TestVectorFixturesArrow:
    def test_no_python_rdd_scan(self, spark):
        for df in (polygons_df(spark, 7), query_points_df(spark, 9)):
            plan = _formatted_plan(df)
            assert "Scan ExistingRDD" not in plan, plan

    def test_values_bit_identical_to_source(self, spark):
        rows = {r["poly_id"]: r for r in polygons_df(spark, 7).collect()}
        for p, xs, ys in make_polygons(7):
            assert list(rows[p]["xs"]) == xs      # float equality ==
            assert list(rows[p]["ys"]) == ys      # bit round-trip
        qrows = {r["query_id"]: r
                 for r in query_points_df(spark, 9).collect()}
        for q, lon, lat, k in make_query_points(9):
            assert qrows[q]["lon"] == lon
            assert qrows[q]["lat"] == lat
            assert qrows[q]["k"] == k
