"""Structured Streaming surface: continuous page ingest -> geocode ->
windowed tile rollups, plus stateful streaming dedup.

The reference is a batch CLI (SURVEY §2.9: no streaming required), but
a web-scale ingest pipeline consumes the same operators continuously;
this module re-expresses the engine's point pipeline on
``readStream``: every transformation below is the SAME Column
expression used by the batch path (sources.pages / functions.tilemath
/ operators.burn), so batch/stream parity is by construction — only
the source and sink differ.

Scale notes: the tile rollup is an incremental stateful aggregation
keyed by (window, tile) — state size is bounded by (active windows x
lit tiles), and the watermark expires closed windows so state does not
grow with stream length.  Streaming exact-dedup keys state by
md5(text) via ``dropDuplicatesWithinWatermark``, whose state store
evicts a hash once the watermark passes its last-seen event time —
bounded state by construction (see streaming_exact_dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.pages import (EPOCH_2025, page_lang_col, page_text_col,
                            page_url_col)


def stream_pages(spark: SparkSession, rows_per_second: int = 1000,
                 n_hosts: int = 100) -> DataFrame:
    """Unbounded pages stream from the rate source.

    Each rate tick becomes one synthetic page via the SHARED column
    builders of sources.pages (byte-identical text per url by
    construction, not by copy), with ``warc_ts`` as the event-time
    column."""
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())
    url = page_url_col(F.col("value"), n_hosts)
    text = page_text_col(url)
    lang = page_lang_col(url)
    return rate.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(EPOCH_2025) + F.col("value"))
        .alias("warc_ts"),
        text.alias("text"),
        lang.alias("lang"))


def with_stream_geo(pages: DataFrame, tile_z: int = 7) -> DataFrame:
    """Attach the deterministic geocode + TMS tile keys (identical
    expressions to sources.pages.with_geo — narrow, streaming-safe)."""
    from .functions.tilemath import geo_lat, geo_lon, tile_x, tile_y_tms
    lon = geo_lon(F.col("url"))
    lat = geo_lat(F.col("url"))
    return (pages.withColumn("lon", lon).withColumn("lat", lat)
            .withColumn("tile_z", F.lit(tile_z).cast("int"))
            .withColumn("tile_x", tile_x(F.col("lon"), tile_z))
            .withColumn("tile_y", tile_y_tms(F.col("lat"), tile_z)))


def streaming_tile_counts(pages: DataFrame, tile_z: int = 7,
                          window: str = "1 minute",
                          watermark: str = "2 minutes") -> DataFrame:
    """Event-time windowed tile rollup with late-data handling:
    (window, z, x, y, n_pages).

    Incremental partial aggregation (update-mode compatible); the
    watermark expires window state once no row older than
    ``watermark`` can arrive."""
    geo = with_stream_geo(pages, tile_z=tile_z)
    return (geo.withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("win"),
                     "tile_z", "tile_x", "tile_y")
            .agg(F.count("*").alias("n_pages"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("tile_z").alias("z"),
                    F.col("tile_x").alias("x"),
                    F.col("tile_y").alias("y"), "n_pages"))


def streaming_exact_dedup(pages: DataFrame,
                          watermark: str = "10 minutes") -> DataFrame:
    """Streaming A1: keep the first arrival of each distinct text.

    Uses ``dropDuplicatesWithinWatermark`` so state keyed by
    md5(text) is actually EVICTED once the watermark passes a hash's
    last-seen event time.  Plain ``dropDuplicates(['text_md5'])``
    would only evict state if the event-time column were part of the
    dedup subset — with a non-event-time key its state grows
    unboundedly on a long stream (round-2 ADVICE).  Semantics:
    duplicates arriving within the watermark delay of each other are
    suppressed; a hash re-appearing after its state expired is
    emitted again — the standard bounded-state trade for unbounded
    streams."""
    return (pages
            .withColumn("text_md5", F.md5(F.col("text")))
            .withWatermark("warc_ts", watermark)
            .dropDuplicatesWithinWatermark(["text_md5"]))


TILE_FIRST_SEEN_SCHEMA = ("tile_z int, tile_x bigint, tile_y bigint, "
                          "first_seen_s bigint, n_pages bigint")
_FIRST_SEEN_STATE = "first_seen_s bigint, n_pages bigint"


def streaming_tile_first_seen(pages: DataFrame, tile_z: int = 7,
                              watermark: str = "10 minutes"
                              ) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``:
    per-tile (first_seen event time, running page count), maintained
    across micro-batches.

    This is the operator shape Spark's built-in aggregations cannot
    express incrementally when the merge is user-defined (here the
    state is a (min, sum) pair but the same harness carries arbitrary
    per-key state — e.g. per-tile reservoir samples or online
    quantiles).  State is one 16-byte tuple per lit tile — bounded by
    the tile grid, not the stream length.  Emits the updated row per
    key per micro-batch (update semantics)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    geo = with_stream_geo(pages, tile_z=tile_z)
    keyed = (geo.withWatermark("warc_ts", watermark)
             .select("tile_z", "tile_x", "tile_y",
                     F.unix_timestamp("warc_ts").alias("ts")))

    def update(key, pdfs, state):
        import pandas as pd
        first_s, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            mn = int(pdf["ts"].min())
            first_s = mn if first_s is None else min(first_s, mn)
            n += len(pdf)
        state.update((first_s, n))
        yield pd.DataFrame({
            "tile_z": [key[0]], "tile_x": [key[1]],
            "tile_y": [key[2]],
            "first_seen_s": [first_s], "n_pages": [n]})

    return (keyed.groupBy("tile_z", "tile_x", "tile_y")
            .applyInPandasWithState(
                update, TILE_FIRST_SEEN_SCHEMA, _FIRST_SEEN_STATE,
                "update", GroupStateTimeout.NoTimeout))


def run_stream_to_memory(stream: DataFrame, name: str,
                         output_mode: str = "update"):
    """Test/demo sink: run the streaming query into an in-memory table
    and return the StreamingQuery (caller: processAllAvailable(),
    then spark.table(name))."""
    return (stream.writeStream.format("memory").queryName(name)
            .outputMode(output_mode).start())
