"""Sparse relational pyramid: the burn->pyramid chain without moving
pixel buffers between stages.

The density raster a burn produces is sparse (lit pixels only), and
the 2x2 box downsample is a *linear* operator per channel — so the
whole pyramid can be derived relationally on a sparse pixel relation

    pixels(z, gx, gy, r, g, b, a)     -- global pixel coords, y-down

with one pure-JVM aggregation per level:

    parent(gx>>1, gy>>1).channel = (sum(children channel) + 2) >> 2

(missing children contribute 0 = transparent, exactly the
tms_align-embed semantics).  256x256 buffers are materialized only
ONCE per level, in a fused kernel that paints, MD5-hashes, and
PNG-encodes in a single pass — so tile payloads never cross an
exchange at all: the only shuffles in the whole pyramid carry ~40-byte
sparse pixel rows.

Equivalence to the generic buffer pipeline (operators.pyramid) is
asserted in tests: identical tile ids and payloads level by level.
This is the engine's scale path for burns (SURVEY.md §4 physical
sketch, re-planned); the buffer pipeline remains for dense rasters
(fixtures, warp outputs) where sparsity doesn't hold.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import signed_low64
from ..grid import TILE_SIDE

PIXEL_SCHEMA = "z int, gx bigint, gy bigint, r int, g int, b int, a int"
RENDERED_SCHEMA = ("z int, x bigint, y bigint, tile_id bigint, "
                   "tile_hex string, tile_data binary")


def heat_pixels(hist: DataFrame, z: int) -> DataFrame:
    """Burn histogram -> sparse RGBA pixels at native z.

    hist: (z, x(TMS), y(TMS), ppx, ppy, w).  The heat ramp is the
    SQL form of burn._heat_rgba: white with
    alpha = max(1, min(255, floor(32*log2(1+w))))."""
    n = 1 << z
    alpha = F.greatest(
        F.least(F.lit(255),
                F.floor(F.lit(32.0) * F.log2(F.lit(1.0) + F.col("w")))),
        F.lit(1)).cast("int")
    # global pixel coords are y-down: convert TMS tile y back
    gy = (F.lit(n - 1) - F.col("y")) * TILE_SIDE + F.col("ppy")
    gx = F.col("x") * TILE_SIDE + F.col("ppx")
    return hist.select(
        F.lit(z).cast("int").alias("z"),
        gx.cast("long").alias("gx"), gy.cast("long").alias("gy"),
        F.lit(255).alias("r"), F.lit(255).alias("g"),
        F.lit(255).alias("b"), alpha.alias("a"))


def downsample_pixels(pixels: DataFrame) -> DataFrame:
    """One level down: 2x2 box on the sparse relation (pure JVM)."""
    return (pixels
            .groupBy((F.col("gx") / 2).cast("long").alias("gx"),
                     (F.col("gy") / 2).cast("long").alias("gy"))
            .agg(((F.sum("r") + 2) / 4).cast("int").alias("r"),
                 ((F.sum("g") + 2) / 4).cast("int").alias("g"),
                 ((F.sum("b") + 2) / 4).cast("int").alias("b"),
                 ((F.sum("a") + 2) / 4).cast("int").alias("a")))


def sparse_levels(hist: DataFrame, z: int,
                  min_resolution: int = 0,
                  buffer: str = "native") -> Dict[int, DataFrame]:
    """{level: sparse pixels} from native z down to min_resolution.
    Shuffle volume decays 4x per level; rows are ~40 bytes.

    buffer:
      'native' (default) — eagerly checkpoint only the native pixels
        (the expensive upstream: pages synth + histogram); deeper
        levels re-derive through cheap decaying JVM aggs per consumer,
        avoiding one fixed checkpoint job per level;
      'all' — eagerly checkpoint every level (best when many separate
        actions consume mid levels);
      'none' — no materialization (caller manages persistence).
    """
    native = heat_pixels(hist, z)
    if buffer in ("native", "all"):
        native = native.localCheckpoint(eager=True)
    levels = {z: native}
    cur = native
    for r in range(z - 1, min_resolution - 1, -1):
        cur = downsample_pixels(cur).withColumn(
            "z", F.lit(r).cast("int")).select(
            "z", "gx", "gy", "r", "g", "b", "a")
        if buffer == "all":
            cur = cur.localCheckpoint(eager=True)
        levels[r] = cur
    return levels


def render_sparse_level(pixels: DataFrame, z: int, renderer,
                        parallelism: Optional[int] = None) -> DataFrame:
    """Fused paint+hash+encode: sparse pixels -> rendered tiles.

    Output: (z, x(TMS), y(TMS), tile_id, tile_hex, tile_data=encoded).
    The canvas exists only inside the kernel; the MD5 is of the RAW
    RGBA buffer (A1 contract) and tile_data is the encoded payload."""
    n = 1 << z
    keyed = pixels.withColumn("_tx", (F.col("gx") / TILE_SIDE)
                              .cast("long")) \
                  .withColumn("_ty", (F.col("gy") / TILE_SIDE)
                              .cast("long"))
    sc = pixels.sparkSession.sparkContext
    p = parallelism or sc.defaultParallelism
    keyed = keyed.repartition(p, "_tx", "_ty")

    def paint(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["_tx"].iloc[0])
        ty = int(pdf["_ty"].iloc[0])
        canvas = np.zeros((TILE_SIDE, TILE_SIDE, 4), dtype=np.uint8)
        lx = (pdf["gx"].to_numpy() - tx * TILE_SIDE).astype(np.int64)
        ly = (pdf["gy"].to_numpy() - ty * TILE_SIDE).astype(np.int64)
        canvas[ly, lx, 0] = pdf["r"].to_numpy(np.uint8)
        canvas[ly, lx, 1] = pdf["g"].to_numpy(np.uint8)
        canvas[ly, lx, 2] = pdf["b"].to_numpy(np.uint8)
        canvas[ly, lx, 3] = pdf["a"].to_numpy(np.uint8)
        raw = canvas.tobytes()
        hx = hashlib.md5(raw).hexdigest()
        return pd.DataFrame({
            "z": [z], "x": [tx],
            "y": [n - 1 - ty],                       # TMS flip
            "tile_id": [signed_low64(int(hx, 16))],
            "tile_hex": [hx],
            "tile_data": [renderer.render(raw)],
        })

    return keyed.groupBy("_tx", "_ty").applyInPandas(
        paint, schema=RENDERED_SCHEMA)


def sparse_pyramid_rendered(spark: SparkSession, hist: DataFrame,
                            z: int, renderer,
                            min_resolution: int = 0
                            ) -> Tuple[DataFrame, DataFrame]:
    """Full fused pipeline: histogram -> per-level sparse downsample ->
    fused render -> (images, map).

    images: (tile_id, tile_data encoded, tile_hex), canonical row =
    min (z, x, y) per hash (same order-free first-wins as
    pyramid.dedup_tiles); map: (zoom_level, tile_column, tile_row,
    tile_id).  Dup tiles cost one wasted encode each — the trade for
    never shuffling payloads; use the buffer pipeline when the dup
    ratio is high (constant oceans etc.)."""
    levels = sparse_levels(hist, z, min_resolution=min_resolution)
    rendered = None
    for r in sorted(levels):
        lvl = render_sparse_level(levels[r], r, renderer)
        rendered = lvl if rendered is None else rendered.unionByName(lvl)
    rendered = rendered.localCheckpoint(eager=False)

    map_df = rendered.select(
        F.col("z").alias("zoom_level"),
        F.col("x").alias("tile_column"),
        F.col("y").alias("tile_row"), "tile_id")
    canon = (rendered.select("tile_id", "z", "x", "y")
             .groupBy("tile_id")
             .agg(F.min(F.struct("z", "x", "y")).alias("_c"))
             .select(F.col("tile_id").alias("_ctid"), "_c"))
    images = (rendered.join(
        F.broadcast(canon),
        (F.col("tile_id") == F.col("_ctid"))
        & (F.struct("z", "x", "y") == F.col("_c")), "inner")
        .select("tile_id", "tile_data", "tile_hex"))
    return images, map_df
