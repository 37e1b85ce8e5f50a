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
import os
import sys
import time
from typing import Dict, Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import signed_low64
from ..grid import TILE_SIDE

_PROF = os.environ.get("SPARK_GRAFT_PROFILE")


def _prof(tag: str, t0: float) -> float:
    """Driver-wall profiler (SPARK_GRAFT_PROFILE=1 -> stderr, =path ->
    append to file): one line per driver-blocking step, used to locate
    the serial floor S."""
    t1 = time.time()
    if _PROF:
        line = f"PROF {tag} {t1 - t0:.2f}"
        if _PROF == "1":
            print(line, file=sys.stderr, flush=True)
        else:
            with open(_PROF, "a") as fh:
                fh.write(line + "\n")
    return t1


PIXEL_SCHEMA = "z int, gx bigint, gy bigint, r int, g int, b int, a int"

# --- md5 zero-prefix states (round 6) ---------------------------------------
# The A1 contract hashes the FULL 256 KB canvas per unique tile, and the
# kernel profile (BENCH/profile_kernel.py) put md5 at ~48% of phase-kernel
# W.  A burn tile is mostly all-zero rows; md5 state after r zero rows is
# tile-independent, so 257 cached states (one 256 KB zero pass, built once
# per worker process) let each tile skip straight to its first lit row.
# Digests are bit-identical to hashlib.md5(raw) by construction (same byte
# stream through the same compression function).
_ROW_BYTES = TILE_SIDE * 4
_MD5_ZSTATES = None


def _md5_sparse(raw, first_row: int):
    """md5 of the full canvas ``raw`` (flat memoryview), resuming from
    the cached state after ``first_row`` all-zero rows."""
    global _MD5_ZSTATES
    if _MD5_ZSTATES is None:
        zrow = bytes(_ROW_BYTES)
        states = [hashlib.md5()]
        for _ in range(TILE_SIDE):
            h = states[-1].copy()
            h.update(zrow)
            states.append(h)
        _MD5_ZSTATES = states
    h = _MD5_ZSTATES[first_row].copy()
    h.update(raw[first_row * _ROW_BYTES:])
    return h

# canon broadcast cap: 128 MB of ~64 B rows (2M distinct images) is
# cheap to torrent-broadcast and keeps tile payloads exchange-free;
# beyond it the min_by single-shuffle fallback is the scale plan
_CANON_BC_CAP = 128 * 1024 * 1024

# Arrow input batch for PIXEL kernels: the session default (256 rows,
# sized for 262KB tile buffers) hands a pixel kernel ~10KB frames —
# a z12 task concatenates ~20k of them, measured 182->159s on the
# phase pass when raised to 64k rows (~2.6MB of 40B pixel rows).
_PIXEL_ARROW_BATCH = 65536
_ARROW_BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


class _pixel_batch_conf:
    """Scoped raise of the Arrow input batch size for the eager pixel
    -kernel materializations inside this module; restores the session
    default (which bounds TILE-buffer batches) on exit."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.old = self.spark.conf.get(_ARROW_BATCH_KEY, None)
        self.spark.conf.set(_ARROW_BATCH_KEY, str(_PIXEL_ARROW_BATCH))

    def __exit__(self, *exc):
        if self.old is not None:
            self.spark.conf.set(_ARROW_BATCH_KEY, self.old)
        else:
            # conf.get(key, None) is None when the session never set
            # the key explicitly — unset, or the raised pixel batch
            # size would leak onto 262KB tile-buffer kernels
            self.spark.conf.unset(_ARROW_BATCH_KEY)
        return False
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
                        parallelism: Optional[int] = None,
                        out_chunk: int = 1024) -> DataFrame:
    """Fused paint+hash+encode: sparse pixels -> rendered tiles.

    Output: (z, x(TMS), y(TMS), tile_id, tile_hex, tile_data=encoded).
    The canvas exists only inside the kernel; the MD5 is of the RAW
    RGBA buffer (A1 contract) and tile_data is the encoded payload.

    One hash repartition co-locates each tile's pixels, then a
    partition-level ``mapInPandas`` groups tiles with one numpy
    lexsort — NOT groupBy.applyInPandas, whose per-group pandas
    DataFrame construction dominates when most groups are a handful
    of rows (measured ~2 ms/tile of pure overhead on 340k tiles).
    Per-task memory is bounded by the partition's SPARSE row count
    (~40 bytes/row), never by materialized canvases: painted tiles
    stream out in ``out_chunk``-row batches."""
    n = 1 << z
    keyed = pixels.withColumn("_tx", (F.col("gx") / TILE_SIDE)
                              .cast("long")) \
                  .withColumn("_ty", (F.col("gy") / TILE_SIDE)
                              .cast("long"))
    sc = pixels.sparkSession.sparkContext
    p = parallelism or sc.defaultParallelism
    keyed = keyed.repartition(p, "_tx", "_ty")

    def paint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = (parts[0] if len(parts) == 1
               else pd.concat(parts, ignore_index=True))
        tx = pdf["_tx"].to_numpy(np.int64)
        ty = pdf["_ty"].to_numpy(np.int64)
        gx = pdf["gx"].to_numpy(np.int64)
        gy = pdf["gy"].to_numpy(np.int64)
        ch = [pdf[c].to_numpy().astype(np.uint8)
              for c in ("r", "g", "b", "a")]
        lx_all = (gx & 255).astype(np.uint8)
        ly_all = (gy & 255).astype(np.uint8)
        # (ly, lx) in the sort canonicalizes within-tile pixel order
        # for the content-addressed cache (same scheme as the phase
        # kernel; PLANS.md §9)
        order = np.lexsort((lx_all, ly_all, ty, tx))
        key = tx[order] * (np.int64(1) << 32) + ty[order]
        _, starts = np.unique(key, return_index=True)
        bounds = np.append(starts, len(key))

        o_x: list = []
        o_y: list = []
        o_id: list = []
        o_hex: list = []
        o_data: list = []

        def flush():
            chunk = pd.DataFrame({
                "z": np.full(len(o_x), z, dtype=np.int32),
                "x": np.asarray(o_x, dtype=np.int64),
                "y": np.asarray(o_y, dtype=np.int64),
                "tile_id": np.asarray(o_id, dtype=np.int64),
                "tile_hex": list(o_hex),
                "tile_data": list(o_data)})
            for lst in (o_x, o_y, o_id, o_hex, o_data):
                lst.clear()
            return chunk

        canvas = np.zeros((TILE_SIDE, TILE_SIDE, 4), dtype=np.uint8)
        cache: Dict[bytes, Tuple[int, str, bytes]] = {}
        for i in range(len(starts)):
            s, e = starts[i], bounds[i + 1]
            idx = order[s:e]
            t_x, t_y = int(tx[idx[0]]), int(ty[idx[0]])
            lx = lx_all[idx]
            ly = ly_all[idx]
            ck = (lx.tobytes() + ly.tobytes()
                  + b"".join(c[idx].tobytes() for c in ch))
            hit = cache.get(ck)
            if hit is None:
                for c in range(4):
                    canvas[ly, lx, c] = ch[c][idx]
                # zero-copy flat view: md5 + encode read the canvas in
                # place — canvas.tobytes() cost a 512 KB copy (read +
                # write) per unique tile, pure memory traffic on the
                # substrate-bandwidth-bound wide legs (PLANS.md §9/10)
                raw = canvas.reshape(-1).data
                # ly is (ly, lx)-sorted: resume md5 from the cached
                # zero-prefix state; pass ly (dups allowed) as the
                # lit hint — see pyramid_phase_rendered's kernel
                hx = _md5_sparse(raw, int(ly[0])).hexdigest()
                hit = (signed_low64(int(hx, 16)), hx,
                       renderer.render(raw, lit_hint=ly))
                canvas[ly, lx] = 0          # clear only lit pixels
                if len(cache) >= 200_000:
                    cache.clear()
                cache[ck] = hit
            o_x.append(t_x)
            o_y.append(n - 1 - t_y)                  # TMS flip
            o_id.append(hit[0])
            o_hex.append(hit[1])
            o_data.append(hit[2])
            if len(o_x) >= out_chunk:
                yield flush()
        if o_x:
            yield flush()

    return keyed.mapInPandas(paint, schema=RENDERED_SCHEMA)


# phased-kernel output: rendered tile rows (kind=0) union next-phase
# sparse pixel rows (kind=1) in one nullable schema
PHASE_SCHEMA = ("kind int, z int, x bigint, y bigint, tile_id bigint, "
                "tile_hex string, tile_data binary, "
                "gx bigint, gy bigint, r int, g int, b int, a int")

_KEY_SHIFT = np.int64(1) << 32


def _null_ints(n: int, dtype) -> pd.arrays.IntegerArray:
    """All-null pandas nullable-int column of length n, built from a
    mask (no per-element Python work)."""
    return pd.arrays.IntegerArray(np.zeros(n, dtype=dtype),
                                  np.ones(n, dtype=bool))


def _tile_chunk(o_z, o_x, o_y, o_id, o_hex, o_data) -> pd.DataFrame:
    """kind=0 rows of PHASE_SCHEMA from per-column lists (pixel
    columns all-null)."""
    n = len(o_z)
    return pd.DataFrame({
        "kind": np.zeros(n, dtype=np.int32),
        "z": np.asarray(o_z, dtype=np.int32),
        "x": np.asarray(o_x, dtype=np.int64),
        "y": np.asarray(o_y, dtype=np.int64),
        "tile_id": np.asarray(o_id, dtype=np.int64),
        "tile_hex": o_hex,
        "tile_data": o_data,
        "gx": _null_ints(n, np.int64),
        "gy": _null_ints(n, np.int64),
        "r": _null_ints(n, np.int32),
        "g": _null_ints(n, np.int32),
        "b": _null_ints(n, np.int32),
        "a": _null_ints(n, np.int32)})


def _pixel_chunk(gx: np.ndarray, gy: np.ndarray, ch) -> pd.DataFrame:
    """kind=1 rows of PHASE_SCHEMA straight from the shrunk sparse
    arrays (tile columns all-null) — no per-row Python loop."""
    m = len(gx)
    none_obj = np.full(m, None, dtype=object)
    return pd.DataFrame({
        "kind": np.ones(m, dtype=np.int32),
        "z": _null_ints(m, np.int32),
        "x": _null_ints(m, np.int64),
        "y": _null_ints(m, np.int64),
        "tile_id": _null_ints(m, np.int64),
        "tile_hex": none_obj,
        "tile_data": none_obj,
        "gx": gx.astype(np.int64),
        "gy": gy.astype(np.int64),
        "r": ch[0].astype(np.int32),
        "g": ch[1].astype(np.int32),
        "b": ch[2].astype(np.int32),
        "a": ch[3].astype(np.int32)})


def _shrink_sparse(gx, gy, ch):
    """One 2x2 box level on sparse arrays: group by (gx>>1, gy>>1),
    per-channel (sum + 2) >> 2 — the numpy twin of downsample_pixels
    (missing children contribute 0), bit-identical to the canvas
    shrink because box blocks never cross tile boundaries."""
    key = (gx >> 1) * _KEY_SHIFT + (gy >> 1)
    order = np.argsort(key, kind="stable")
    key = key[order]
    uniq, starts = np.unique(key, return_index=True)
    out_ch = []
    for c in ch:
        sums = np.add.reduceat(c[order].astype(np.int64), starts)
        out_ch.append(((sums + 2) >> 2).astype(np.int64))
    return uniq // _KEY_SHIFT, uniq % _KEY_SHIFT, out_ch


def pyramid_phase_rendered(pixels: DataFrame, top: int, bottom: int,
                           renderer, emit_pixels: bool,
                           parallelism: Optional[int] = None,
                           out_chunk: int = 1024) -> DataFrame:
    """Render levels [top..bottom] in ONE kernel pass.

    Input: sparse pixels at level ``top``.  Partitioning by the
    level-``bottom`` ancestor tile guarantees all four children of any
    parent tile >= bottom are co-located, so the kernel can loop:
    paint+hash+encode every tile of the current level, then 2x2-shrink
    the sparse rows in-task and recurse — one shuffle and one plan for
    ``top - bottom + 1`` levels instead of one per level (the per-level
    chain's serial Catalyst/scheduling cost dominated the 4-vs-16-core
    scaling gap).  With emit_pixels the kernel also outputs the
    level-(bottom-1) sparse rows that seed the next phase."""
    n_top = 1 << top
    shift = 8 + (top - bottom)          # log2(TILE_SIDE) + level gap
    keyed = pixels.select(
        "gx", "gy", "r", "g", "b", "a",
        F.shiftright("gx", shift).alias("_ax"),
        F.shiftright("gy", shift).alias("_ay"))
    sc = pixels.sparkSession.sparkContext
    # 4 partitions/core (round 6; was 2): a single wave (1/core) pays
    # the full task-duration spread as wall time, and with the round-6
    # kernel at ~6-8 s/task the spread is a bigger FRACTION of the
    # task than it was at r05 task sizes — interleaved A/B at z10
    # measured 64/128/256 partitions at 21.0/19.4/18.5 s; four waves
    # keep the tail small while per-task fixed cost (one
    # concat+lexsort) stays amortized over >=10k pixel rows/task at
    # bench scale and above.  Never more partitions than distinct
    # ancestor keys (4^bottom): the surplus partitions are provably
    # empty and each still costs a task launch + python round trip
    # (the apex-adjacent pass has only 64 keys).
    p = parallelism or 4 * sc.defaultParallelism
    if bottom < 16:
        p = min(p, 4 ** bottom)
    keyed = keyed.repartition(p, "_ax", "_ay")
    kernel = _phase_kernel(top, bottom, renderer, emit_pixels,
                           out_chunk)
    return keyed.mapInPandas(kernel, schema=PHASE_SCHEMA)


def _phase_kernel(top: int, bottom: int, renderer, emit_pixels: bool,
                  out_chunk: int = 1024):
    """Build the multi-level paint+hash+encode kernel closure (module
    level so BENCH/profile_kernel.py profiles the REAL kernel)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = (parts[0] if len(parts) == 1
               else pd.concat(parts, ignore_index=True))
        gx = pdf["gx"].to_numpy(np.int64)
        gy = pdf["gy"].to_numpy(np.int64)
        ch = [pdf[c].to_numpy().astype(np.int64)
              for c in ("r", "g", "b", "a")]

        # per-column accumulators (round 6: the per-tile dict building
        # + row-wise _chunk re-read was ~10% of kernel W in the
        # BENCH/profile_kernel.py decomposition)
        o_z: list = []
        o_x: list = []
        o_y: list = []
        o_id: list = []
        o_hex: list = []
        o_data: list = []
        canvas = np.zeros((TILE_SIDE, TILE_SIDE, 4), dtype=np.uint8)
        # content-addressed render cache: a burn's tiles average ~1-2
        # sparse pixels, so payload-identical tiles are rampant; a
        # hit skips paint+md5+encode — ~0.75 MB of memory traffic per
        # tile, the SHARED resource that showed up as the
        # mode-independent serial floor S at z12 (PLANS.md §9).  The
        # sort below includes (ly, lx) so within-tile pixel order is
        # canonical and duplicate content always builds the same key.
        cache: Dict[bytes, Tuple[int, str, bytes]] = {}
        for lvl in range(top, bottom - 1, -1):
            n = 1 << lvl
            tx_all, ty_all = gx >> 8, gy >> 8
            lx_all = (gx & 255).astype(np.uint8)
            ly_all = (gy & 255).astype(np.uint8)
            ch_u8 = [c.astype(np.uint8) for c in ch]
            order = np.lexsort((lx_all, ly_all, ty_all, tx_all))
            key = tx_all[order] * _KEY_SHIFT + ty_all[order]
            _, starts = np.unique(key, return_index=True)
            bounds = np.append(starts, len(key))
            for i in range(len(starts)):
                idx = order[starts[i]:bounds[i + 1]]
                t_x, t_y = int(tx_all[idx[0]]), int(ty_all[idx[0]])
                lx = lx_all[idx]
                ly = ly_all[idx]
                ck = (lx.tobytes() + ly.tobytes()
                      + b"".join(c[idx].tobytes() for c in ch_u8))
                hit = cache.get(ck)
                if hit is None:
                    for c in range(4):
                        canvas[ly, lx, c] = ch_u8[c][idx]
                    raw = canvas.reshape(-1).data   # zero-copy view
                    # ly is (ly, lx)-sorted, so ly[0] is the first lit
                    # row: md5 resumes from the cached zero-prefix
                    # state (bit-identical digest, ~40% less hashing)
                    hx = _md5_sparse(raw, int(ly[0])).hexdigest()
                    # ly (sorted, possibly duplicated) is a valid
                    # lit_hint — the encoder content-verifies rows, and
                    # duplicate indices are idempotent; skipping the
                    # per-tile np.unique saved ~3% kernel W
                    hit = (signed_low64(int(hx, 16)), hx,
                           renderer.render(raw, lit_hint=ly))
                    canvas[ly, lx] = 0      # clear only lit pixels
                    if len(cache) >= 200_000:
                        cache.clear()       # bound task memory
                    cache[ck] = hit
                o_z.append(lvl)
                o_x.append(t_x)
                o_y.append(n - 1 - t_y)
                o_id.append(hit[0])
                o_hex.append(hit[1])
                o_data.append(hit[2])
                if len(o_z) >= out_chunk:
                    yield _tile_chunk(o_z, o_x, o_y, o_id, o_hex,
                                      o_data)
                    o_z, o_x, o_y = [], [], []
                    o_id, o_hex, o_data = [], [], []
            if lvl > bottom or emit_pixels:
                gx, gy, ch = _shrink_sparse(gx, gy, ch)
        if o_z:
            yield _tile_chunk(o_z, o_x, o_y, o_id, o_hex, o_data)
        if emit_pixels and len(gx):
            # vectorized pixel emission: one frame straight from the
            # shrunk arrays (bounded by the level-(bottom-1) relation)
            yield _pixel_chunk(gx, gy, ch)

    return kernel


def _render_apex_driver(spark: SparkSession, pixels: DataFrame,
                        top: int, bottom: int, renderer) -> DataFrame:
    """Render pyramid levels [top..bottom] locally on the driver.

    Only called for top <= 2, where the sparse relation is bounded by
    (256*2^top)^2 rows whatever the input size — the distributed
    version of these levels is all fixed overhead (tiny exchanges,
    python-worker round trips) and no work."""
    pdf = pixels.select("gx", "gy", "r", "g", "b", "a").toPandas()
    gx = pdf["gx"].to_numpy(np.int64)
    gy = pdf["gy"].to_numpy(np.int64)
    ch = [pdf[c].to_numpy().astype(np.int64)
          for c in ("r", "g", "b", "a")]
    rows = []
    canvas = np.zeros((TILE_SIDE, TILE_SIDE, 4), dtype=np.uint8)
    for lvl in range(top, bottom - 1, -1):
        n = 1 << lvl
        tx_all, ty_all = gx >> 8, gy >> 8
        order = np.lexsort((ty_all, tx_all))
        key = tx_all[order] * (np.int64(1) << 32) + ty_all[order]
        _, starts = np.unique(key, return_index=True)
        bounds = np.append(starts, len(key))
        for i in range(len(starts)):
            idx = order[starts[i]:bounds[i + 1]]
            t_x, t_y = int(tx_all[idx[0]]), int(ty_all[idx[0]])
            lx = gx[idx] - (t_x << 8)
            ly = gy[idx] - (t_y << 8)
            canvas[:] = 0
            for c in range(4):
                canvas[ly, lx, c] = ch[c][idx].astype(np.uint8)
            raw = canvas.reshape(-1).data           # zero-copy view
            hx = hashlib.md5(raw).hexdigest()
            rows.append((lvl, t_x, n - 1 - t_y,
                         signed_low64(int(hx, 16)), hx,
                         bytes(renderer.render(
                             raw, lit_hint=np.unique(ly)))))
        if lvl > bottom:
            gx, gy, ch = _shrink_sparse(gx, gy, ch)
    # Arrow path (round 6): createDataFrame(list) plans a Python RDD
    # whose evaluation launches one pickle-deserializing Python worker
    # per default-parallelism slice — measured 32 near-idle tasks /
    # ~1.7 s of wall for ~21 apex rows, surfacing inside whatever job
    # first materializes the lazy apex union (the canon build).  A
    # pandas frame with exact dtypes goes through Arrow: the driver
    # serializes one record batch and the scan is a single JVM task.
    apex_pdf = pd.DataFrame({
        "z": np.array([r[0] for r in rows], dtype=np.int32),
        "x": np.array([r[1] for r in rows], dtype=np.int64),
        "y": np.array([r[2] for r in rows], dtype=np.int64),
        "tile_id": np.array([r[3] for r in rows], dtype=np.int64),
        "tile_hex": [r[4] for r in rows],
        "tile_data": [r[5] for r in rows]})
    return spark.createDataFrame(apex_pdf, schema=RENDERED_SCHEMA)


def sparse_pyramid_rendered(spark: SparkSession, hist: DataFrame,
                            z: int, renderer,
                            min_resolution: int = 0,
                            phase_depth: int = 5,
                            apex_level: int = 3,
                            broadcast_canon: Optional[bool] = None
                            ) -> Tuple[DataFrame, DataFrame]:
    """Full fused pipeline: histogram -> phased multi-level kernels ->
    per-level apex -> (images, map).

    Levels above ``apex_level`` render in ceil(levels/phase_depth)
    multi-level kernel passes (one shuffle + one plan per pass instead
    of per level — the per-level chain's serial Catalyst/scheduling
    cost dominated 4-vs-16-core scaling).  A pass keyed by its bottom
    ancestor has 4^bottom groups; apex_level=3 keeps every pass at
    >= 4^3 = 64 keys.  64 tasks is a parallelism floor, but the
    levels below the last big pass hold a vanishing fraction of the
    pixel relation (<= grid size, decaying 4x per level), so the
    floor costs wall-time only on clusters far wider than the work
    itself — while each fused pass replaces two render stages plus a
    downsample shuffle of round 2's per-level apex chain (measured
    ~15 s of small-stage scheduling at 16 cores, pure serial cost).

    The pyramid apex below ``driver_apex`` is finished ON THE DRIVER:
    a level-L sparse relation has at most (256*2^L)^2 rows regardless
    of input size (<= 1.05M at L=2, ~40 MB), so collecting it is O(1)
    in data scale, and the local numpy render replaces ~6 tiny
    stages' worth of fixed scheduling/exchange overhead — serial cost
    that capped N-vs-4N scaling efficiency.

    images: (tile_id, tile_data encoded, tile_hex), canonical row =
    min (z, x, y) per hash (same order-free first-wins as
    pyramid.dedup_tiles); map: (zoom_level, tile_column, tile_row,
    tile_id).  Dup tiles cost one wasted encode each — the trade for
    never shuffling payloads; use the buffer pipeline when the dup
    ratio is high (constant oceans etc.).

    broadcast_canon=None (default) mirrors dedup_tiles' estimate-then-
    choose: a narrow distinct-id count (over already-checkpointed
    blocks — cheap) sizes the canon relation against
    spark.sql.autoBroadcastJoinThreshold; the payload-shuffle-free
    broadcast plan is used only when canon fits, otherwise a min_by
    aggregate (payloads shuffle once, but nothing is collected to the
    driver — the plan that survives a 100x distinct-image count).
    Pass True/False to force a path and skip the counting pass."""
    pixels = heat_pixels(hist, z)
    apex_top = min(max(apex_level - 1, min_resolution - 1), z)
    if z <= apex_top:
        # no phased passes: the per-level apex chain fans multiple
        # consumers off the native relation — materialize it once
        pixels = pixels.localCheckpoint(eager=True)
    rendered_parts = []
    top = z
    t_prof = time.time()
    while top > apex_top:
        bottom = max(min_resolution, apex_top + 1,
                     top - phase_depth + 1)
        emit = bottom > min_resolution
        out = pyramid_phase_rendered(pixels, top, bottom, renderer,
                                     emit_pixels=emit)
        # one materialization feeds the rendered union and (when
        # pixels are emitted) the next pass/apex seed.  The final
        # phase (emit=False, bottom == min_resolution) needs it just
        # as much: un-checkpointed, the fused paint+hash+encode
        # kernel re-executes for every downstream consumer (canon
        # build, images join, the caller's map action)
        with _pixel_batch_conf(spark):
            out = out.localCheckpoint(eager=True)
        t_prof = _prof(f"phase_ckpt[{top}..{bottom}]", t_prof)
        if emit:
            pixels = out.where(F.col("kind") == 1).select(
                F.lit(bottom - 1).cast("int").alias("z"),
                "gx", "gy", "r", "g", "b", "a")
        rendered_parts.append(out.where(F.col("kind") == 0).select(
            "z", "x", "y", "tile_id", "tile_hex", "tile_data"))
        top = bottom - 1

    # materialize the apex seed as NARROW pixel rows once: the phase
    # checkpoint carries the fat tile_data column, and each per-level
    # branch below would rescan it otherwise.  When min_resolution
    # cuts the pyramid above the apex (top < min_resolution) no apex
    # level renders — skip the seed, which would be a full
    # materialization job whose result nothing reads.  Likewise when
    # NO distributed apex level remains (top <= driver_apex): the
    # driver apex's toPandas is then the seed's only consumer, so the
    # checkpoint is a pure extra materialization job — let toPandas
    # scan the phase-checkpoint filter directly (round 6, ~0.3-0.5 s).
    driver_apex = 2          # <= (256*2^2)^2 = 1.05M rows, any scale
    if (top >= min_resolution and top != z
            and top > driver_apex):
        cur = pixels.localCheckpoint(eager=True)
    else:
        cur = pixels
    t_prof = _prof("apex_seed_ckpt", t_prof)
    apex_parts = []
    lvl = top
    while lvl >= min_resolution and lvl > driver_apex:
        apex_parts.append(render_sparse_level(cur, lvl, renderer))
        if lvl > min_resolution:
            cur = downsample_pixels(cur)
        lvl -= 1
    if lvl >= min_resolution:
        apex_parts.append(_render_apex_driver(
            spark, cur, lvl, min_resolution, renderer))
    if apex_parts:
        # the phased parts above are filters over eager checkpoints —
        # rescanning them per consumer is cheap block reads; only the
        # apex renders are fresh compute, so checkpoint just their
        # small union instead of duplicating the full rendered
        # relation's blocks (the old full-union checkpoint re-wrote
        # ~1.2 GB of already-checkpointed tiles at z10)
        apex = apex_parts[0]
        for part in apex_parts[1:]:
            apex = apex.unionByName(part)
        rendered_parts.append(apex.localCheckpoint(eager=False))
    t_prof = _prof("apex_parts_built", t_prof)

    rendered = rendered_parts[0]
    for part in rendered_parts[1:]:
        rendered = rendered.unionByName(part)

    map_df = rendered.select(
        F.col("z").alias("zoom_level"),
        F.col("x").alias("tile_column"),
        F.col("y").alias("tile_row"), "tile_id")

    canon = None
    # canonical key: min (z, x, y) per hash.  For any slippy pyramid
    # z <= 29 and x, y < 2^z <= 2^29, so the triple packs losslessly
    # into one BIGINT with z in the high bits — min(packed) selects
    # the exact same lexicographic-min row as min(struct(z, x, y)),
    # but the agg runs as a HashAggregate on a primitive long instead
    # of a SortAggregate on a struct buffer (round 6: the struct min
    # forced a sort of the full tiles relation on both sides of the
    # canon exchange — measured canon_build 6.2 -> ~2 s at z10).
    use_packed = z <= 29
    _pk = (F.col("z").cast("long") * F.lit(np.int64(1) << 58)
           + F.col("x") * F.lit(np.int64(1) << 29) + F.col("y"))
    if broadcast_canon is None or broadcast_canon:
        # the canonical-owner relation, built NARROWLY: only
        # (tile_id, packed_key) rows (~16 B) cross the agg shuffle,
        # and the eager checkpoint (a few MB per million distinct
        # images) both materializes the lazy apex union for every
        # downstream consumer and makes the broadcast-decision count
        # free.  Round-5 change (serial-floor work): the decision was
        # previously a total-row-count UPPER bound, which at z12
        # (4.42M rows, 1.58M distinct) wrongly forced the min_by
        # fallback whose ~2 GB payload shuffle cost a measured
        # ~28 s that does NOT scale with cores (shared-disk bound) —
        # the second-largest term of the serial floor S.  The exact
        # distinct count keeps payloads exchange-free well past the
        # old cutoff; _CANON_BC_CAP bounds the broadcast at 128 MB
        # (torrent-distributed, tiny rows), and truly huge pyramids
        # still fall back to the one-shuffle min_by plan.
        ckey = _pk.alias("_c") if use_packed \
            else F.struct("z", "x", "y").alias("_c")
        canon = (rendered.select("tile_id", ckey)
                 .groupBy("tile_id")
                 .agg(F.min("_c").alias("_c"))
                 .select(F.col("tile_id").alias("_ctid"), "_c")
                 .localCheckpoint(eager=True))
        t_prof = _prof("canon_build_ckpt", t_prof)
    if broadcast_canon is None:
        from .pyramid import _CANON_ROW_BYTES
        n_canon = canon.count()
        t_prof = _prof("canon_count", t_prof)
        broadcast_canon = (n_canon * _CANON_ROW_BYTES
                           < _CANON_BC_CAP)

    if broadcast_canon:
        jkey = _pk if use_packed else F.struct("z", "x", "y")
        images = (rendered.join(
            F.broadcast(canon),
            (F.col("tile_id") == F.col("_ctid"))
            & (jkey == F.col("_c")), "inner")
            .select("tile_id", "tile_data", "tile_hex"))
    else:
        # distinct-image relation too big even for _CANON_BC_CAP:
        # pick the canonical payload in ONE hash aggregate.  Payloads
        # (already encoded, ~KB) cross an exchange once; no driver
        # collect, no broadcast — bounded at any distinct-image count.
        images = (rendered.groupBy("tile_id")
                  .agg(F.min_by("tile_data", F.struct("z", "x", "y"))
                       .alias("tile_data"),
                       F.min("tile_hex").alias("tile_hex")))
    return images, map_df
