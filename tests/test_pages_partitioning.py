"""Partitioned pages layout + partition (directory-level) pruning
evidence — the parquet stand-in for SURVEY.md §1's Iceberg
lang/ts-partitioned table (round-3 VERDICT #6)."""

import glob
import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from gdal2mbtiles_spark.sources.pages import synth_pages
from gdal2mbtiles_spark.sources.pages_table import (
    load_pages, write_partitioned_pages)


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestPartitionPruning:
    def test_layout_and_pruned_scan(self, spark, tmp_path):
        path = str(tmp_path / "pages")
        write_partitioned_pages(synth_pages(spark, 2000), path)

        # Hive layout exists for several (lang, month) dirs
        all_files = glob.glob(f"{path}/lang=*/ts_bucket=*/*.parquet")
        en_files = glob.glob(f"{path}/lang=en/ts_bucket=*/*.parquet")
        assert len(all_files) > len(en_files) > 0

        df = load_pages(spark, path, lang="en")
        plan = _formatted_plan(df)
        # the lang predicate must be a PARTITION filter (pruned at
        # listing time), not a pushed data filter
        assert "PartitionFilters" in plan
        pf = [ln for ln in plan.splitlines()
              if "PartitionFilters" in ln][0]
        assert "lang" in pf

        # scanned-file evidence: exactly the lang=en files are read
        scanned = {r[0] for r in df.select(F.input_file_name())
                   .distinct().collect()}
        assert len(scanned) == len(en_files)
        assert all("/lang=en/" in s for s in scanned)

        # row parity with an unpartitioned filter
        want = synth_pages(spark, 2000).where(F.col("lang") == "en")
        assert df.count() == want.count() > 0

    def test_ts_bucket_pruning_composes(self, spark, tmp_path):
        path = str(tmp_path / "pages2")
        # spread warc_ts across two months deterministically
        pages = synth_pages(spark, 500).withColumn(
            "warc_ts",
            F.when(F.xxhash64("url") % 2 == 0,
                   F.col("warc_ts"))
            .otherwise(F.col("warc_ts")
                       + F.expr("INTERVAL 35 DAYS")))
        write_partitioned_pages(pages, path)
        months = sorted({p.split("ts_bucket=")[1].split("/")[0]
                         for p in glob.glob(
                             f"{path}/lang=*/ts_bucket=*")})
        assert len(months) == 2
        df = load_pages(spark, path, lang="fr", ts_bucket=months[0])
        plan = _formatted_plan(df)
        pf = [ln for ln in plan.splitlines()
              if "PartitionFilters" in ln][0]
        assert "lang" in pf and "ts_bucket" in pf
        scanned = {r[0] for r in df.select(F.input_file_name())
                   .distinct().collect()}
        assert scanned and all(
            f"/lang=fr/ts_bucket={months[0]}/" in s for s in scanned)
