"""Pages table loader: Iceberg-first with Parquet fallback.

The production source is an Iceberg table of Common-Crawl-style pages
(BASELINE.json input_hint) — partition pruning on lang / warc_ts and
column pruning (never read ``html`` when only ``text`` is needed) are
native there.  This sandbox has no Iceberg runtime jar, so the loader
falls back to plain Parquet with identical schema; the rest of the
engine is source-agnostic (it only sees the DataFrame).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def load_pages(spark: SparkSession, path_or_table: str,
               columns: Optional[list] = None,
               lang: Optional[str] = None) -> DataFrame:
    """Load the pages source.

    path_or_table: an Iceberg table identifier (``catalog.db.pages``)
    or a Parquet path.  ``columns``/``lang`` push projection and
    partition pruning into the scan (check with
    ``df.explain('formatted')`` — PushedFilters/ReadSchema)."""
    df = None
    if "/" not in path_or_table:
        try:
            df = spark.read.format("iceberg").load(path_or_table)
        except Exception:
            df = None
    if df is None:
        df = spark.read.parquet(path_or_table)
    if lang is not None:
        df = df.where(df["lang"] == lang)
    if columns:
        df = df.select(*columns)
    return df
