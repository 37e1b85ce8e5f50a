"""Distributed raster reprojection: foreign SRS -> Web-Mercator
native tiles.

The reference handles foreign-SRS inputs by shelling to ``gdalwarp
-t_srs EPSG:3857`` before slicing (gdal.py:176-220, main.py:284-303).
This operator is the Spark-native analogue for any projection with
proj.py closed forms (WGS84/ETRS89 UTM transverse Mercator, Lambert
conformal conic): an INVERSE-MAPPING warp — for every target tile
pixel, project its lon/lat into the source grid and sample —
expressed as two Arrow-batched kernels around one equi-join, the
halo-exchange shape that scales to rasters far larger than any
single executor:

1. **target keys** (mapInPandas over target tile ROWS): the source
   boundary back-projects to a lon/lat ring; each task scanlines its
   rows' latitude bands against the ring (cells.band_lon_span — the
   same exact cover the PIP join uses) and emits only intersecting
   tile keys +-1 tile of chord margin.  An oblique footprint (any
   LCC, any off-axis TM) therefore costs O(tiles touched), not the
   bbox O(rows x cols) (round-4 VERDICT #5).
2. **cover** (mapInPandas over the keys, no pixels): each target tile
   projects a boundary sample of itself into source pixel space and
   emits one id-only row per overlapped 256x256 source block, plus
   its source-window bbox.  The map is smooth, so a 16-point boundary
   sample + a curvature-scaled margin bounds the true window.
3. equi-join with the source block relation on (bx, by) — the only
   exchange that moves pixel payloads, each block replicated only to
   the target tiles that actually read it (the replication factor is
   ~(scale+1)^2, independent of raster size).
4. **sample** (applyInPandas per target tile): assemble the joined
   blocks into the tile's source window and run the vectorized
   near/bilinear inverse-mapping resample; pixels falling outside the
   source raster become transparent.

No driver-side pixel collection anywhere; the driver only computes
the target tile ROW RANGE from the projected source boundary (O(edge
samples) numpy).
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cells import MAX_MERCATOR_LAT, band_lon_span, tile_row_lat
from ..grid import TILE_SIDE
from ..proj import projection_for_epsg

B = 256
EARTH_R = 6378137.0
_MARGIN = 4          # source-px safety margin over the boundary bbox


def _boundary_ring_px(xsize: int, ysize: int, pts: int = 64
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Boundary samples in RING order (top L->R, right T->B, bottom
    R->L, left B->T) — a simple polygon for the scanline cover."""
    xs = np.linspace(0.0, float(xsize), pts)
    ys = np.linspace(0.0, float(ysize), pts)
    bx = np.concatenate([xs[:-1], np.full(pts - 1, xsize),
                         xs[::-1][:-1], np.zeros(pts - 1)])
    by = np.concatenate([np.zeros(pts - 1), ys[:-1],
                         np.full(pts - 1, ysize), ys[::-1][:-1]])
    return bx, by


def _tile_lonlat_grid(tx: int, ty_xyz: int, z: int, pts: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """lon/lat of a (pts x pts) sample grid over one XYZ tile."""
    n = float(1 << z)
    fx = tx + np.linspace(0.0, 1.0, pts)
    fy = ty_xyz + np.linspace(0.0, 1.0, pts)
    gx, gy = np.meshgrid(fx, fy)
    lon = gx / n * 360.0 - 180.0
    t = math.pi * (1.0 - 2.0 * gy / n)
    lat = np.degrees(np.arctan(np.sinh(t)))
    return lon.ravel(), lat.ravel()


def pick_target_zoom(ground_res_m: float, lat_center: float) -> int:
    """Zoom whose ground resolution at ``lat_center`` is closest (in
    log space) to the source's — the reference's native-resolution
    rule transplanted to a metric source grid."""
    best, best_err = 0, float("inf")
    coslat = max(math.cos(math.radians(lat_center)), 1e-6)
    for z in range(25):
        res = 2.0 * math.pi * EARTH_R * coslat / (TILE_SIDE * (1 << z))
        err = abs(math.log(res / ground_res_m))
        if err < best_err:
            best, best_err = z, err
    return best


def target_tile_keys(spark: SparkSession, ring_lon: np.ndarray,
                     ring_lat: np.ndarray, z: int,
                     full_width: bool = False,
                     wrap_cols: bool = False) -> DataFrame:
    """Target XYZ tile keys (tx, ty y-down) intersecting a lon/lat
    boundary ring, +-1 tile of chord margin — the exact scanline
    cover (cells.band_lon_span) distributed over tile ROWS, replacing
    the bbox ``spark.range`` product: an oblique footprint (any LCC,
    off-axis TM) costs O(tiles touched), not O(rows x cols)
    (round-4 VERDICT #5).  Empty extra tiles cost one skipped cover
    row each, never pixels.

    full_width=True skips the per-band lon scanline and emits every
    tile column for each latitude band — the pole/antimeridian path
    (round 5): a footprint that encloses a geographic pole covers all
    longitudes anyway, and one that crosses the antimeridian has no
    single [lo, hi] lon interval.  Correctness is unaffected either
    way (the cover kernel discards tiles whose back-projected window
    misses the source); the cost is one discarded 16x16 boundary
    sample per extra tile, acceptable at the moderate zooms polar
    ground resolutions pick — but it is ONLY for pole-enclosing
    footprints.

    wrap_cols=True runs the scanline on an UNWRAPPED ring (continuous
    lon coordinate, possibly outside [-180, 180]) and emits each
    band's columns modulo 2^z — the antimeridian path: a UTM zone
    1/60 source crossing +-180 stays O(tiles touched) instead of the
    full-width O(rows x 2^z) cliff at 10 m zooms."""
    from ..cells import lonlat_to_xyz

    n = 1 << z

    def _ty(lat: float) -> int:
        # the shared slippy formula (lat pre-clipped by the caller)
        _x, y = lonlat_to_xyz(np.array([0.0]), np.array([lat]), z)
        return int(y[0])

    ty0 = max(_ty(float(ring_lat.max())) - 1, 0)
    ty1 = min(_ty(float(ring_lat.min())) + 1, n - 1)

    # precomputed edge vectors for cells.band_lon_span (the shared
    # exact scanline): closure-captured into the row-expansion kernel
    ex0, ey0 = ring_lon, ring_lat
    ex1, ey1 = np.roll(ring_lon, -1), np.roll(ring_lat, -1)
    edy = ey1 - ey0
    ehoriz = edy == 0.0

    def expand_rows_full(batches: Iterator[pd.DataFrame]
                         ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tys = pdf["ty"].to_numpy(np.int64)
            yield pd.DataFrame(
                {"tx": np.tile(np.arange(n, dtype=np.int64),
                               len(tys)),
                 "ty": np.repeat(tys, n)})

    def expand_rows(batches: Iterator[pd.DataFrame]
                    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_tx, out_ty = [], []
            tys = pdf["ty"].to_numpy(np.int64)
            lat_tops = tile_row_lat(tys, z)
            lat_bots = tile_row_lat(tys + 1, z)
            for ty, lat_top, lat_bot in zip(tys, lat_tops, lat_bots):
                span = band_lon_span(ex0, ey0, ex1, ey1, edy, ehoriz,
                                     lat_top, lat_bot)
                if span is None:
                    continue
                lo, hi = span
                # +-1 col: the ring is a chord sampling of the true
                # curved footprint; empty tiles cost nothing later
                if wrap_cols:
                    # unwrapped lon coordinate: columns wrap mod n
                    x_lo = math.floor((lo + 180.0) / 360.0 * n) - 1
                    x_hi = math.floor((hi + 180.0) / 360.0 * n) + 1
                    if x_hi - x_lo + 1 >= n:
                        cols = range(n)
                    else:
                        cols = (tx % n
                                for tx in range(x_lo, x_hi + 1))
                else:
                    x_lo = int(np.clip(
                        math.floor((lo + 180.0) / 360.0 * n) - 1,
                        0, n - 1))
                    x_hi = int(np.clip(
                        math.floor((hi + 180.0) / 360.0 * n) + 1,
                        0, n - 1))
                    cols = range(x_lo, x_hi + 1)
                for tx in cols:
                    out_tx.append(int(tx))
                    out_ty.append(int(ty))
            if out_tx:
                yield pd.DataFrame(
                    {"tx": pd.Series(out_tx, dtype="int64"),
                     "ty": pd.Series(out_ty, dtype="int64")})

    n_rows = ty1 - ty0 + 1
    parallelism = int(spark.sparkContext.defaultParallelism)
    return (spark.range(ty0, ty1 + 1,
                        numPartitions=min(parallelism, n_rows))
            .select(F.col("id").alias("ty"))
            .mapInPandas(expand_rows_full if full_width
                         else expand_rows,
                         schema="tx long, ty long"))


def reproject_utm_to_tiles(spark: SparkSession, blocks: DataFrame,
                           geotransform: Tuple[float, ...],
                           xsize: int, ysize: int, epsg: int,
                           resolution: int = None,
                           interpolate: str = "near") -> DataFrame:
    """Back-compat name from round 4 (UTM-only then); now a thin
    alias of reproject_to_tiles, which accepts every proj.py CRS."""
    return reproject_to_tiles(spark, blocks, geotransform, xsize,
                              ysize, epsg, resolution=resolution,
                              interpolate=interpolate)


def reproject_to_tiles(spark: SparkSession, blocks: DataFrame,
                       geotransform: Tuple[float, ...],
                       xsize: int, ysize: int, epsg: int,
                       resolution: int = None,
                       interpolate: str = "near") -> DataFrame:
    """Foreign-SRS source blocks -> native EPSG:3857 TMS tiles
    (z, x, y, px).

    geotransform: GDAL-style (E0, dE, 0, N0, 0, -dN) in CRS metres.
    epsg: any projection_for_epsg-supported code (UTM, ETRS89 UTM,
    LCC 2154/3347/26985, polar stereographic 3413/3031/3032, Albers
    5070).
    interpolate: 'near' (gdalwarp's default) or 'bilinear'."""
    proj = projection_for_epsg(epsg)
    e0, de = float(geotransform[0]), float(geotransform[1])
    n0, dn = float(geotransform[3]), -float(geotransform[5])
    if interpolate not in ("near", "bilinear"):
        raise ValueError("reprojection kernels: near | bilinear, not "
                         f"{interpolate!r}")

    # driver: back-project the source boundary RING to lon/lat —
    # O(edge samples) numpy, no pixels
    bpx, bpy = _boundary_ring_px(xsize, ysize)
    ring_lon, ring_lat = proj.inverse(e0 + bpx * de, n0 - bpy * dn)
    ring_lat = np.clip(ring_lat, -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT)

    # pole/antimeridian awareness (round 5, polar CRSes): a source
    # extent that contains a geographic pole back-projects to a ring
    # that circles all longitudes (the scanline "polygon" is
    # meaningless there), and a footprint crossing the antimeridian
    # has no single lon interval.  Detect both from geometry alone —
    # pole: does the pole's forward image land inside the source
    # pixel grid; wrap: ring lons jump by > 180 deg between adjacent
    # samples or leave [-180, 180].
    def _pole_inside(sign: float) -> bool:
        pe, pn = proj.forward(np.array([0.0]),
                              np.array([sign * 89.999999]))
        if not (np.isfinite(pe[0]) and np.isfinite(pn[0])):
            return False
        fx = (pe[0] - e0) / de
        fy = (n0 - pn[0]) / dn
        return 0.0 <= fx <= xsize and 0.0 <= fy <= ysize

    north_in, south_in = _pole_inside(1.0), _pole_inside(-1.0)
    wraps = (float(np.abs(np.diff(ring_lon)).max()) > 180.0
             or float(ring_lon.min()) < -180.0
             or float(ring_lon.max()) > 180.0)
    if north_in:
        ring_lat = np.append(ring_lat, MAX_MERCATOR_LAT)
    if south_in:
        ring_lat = np.append(ring_lat, -MAX_MERCATOR_LAT)

    z = (resolution if resolution is not None
         else pick_target_zoom(de, float(ring_lat.mean())))
    pole = north_in or south_in
    wrap_cols = wraps and not pole
    if wrap_cols:
        # continuous lon coordinate across the antimeridian jump, so
        # the scanline stays exact and O(tiles touched) — full width
        # is reserved for pole-enclosing rings (which really do cover
        # every longitude); a 10 m UTM zone 1/60 source would pay
        # O(rows x 2^z) under full width
        ring_lon = np.degrees(np.unwrap(np.radians(ring_lon)))
    keys = target_tile_keys(spark, ring_lon, ring_lat, z,
                            full_width=pole, wrap_cols=wrap_cols)

    def cover(batches: Iterator[pd.DataFrame]
              ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for tx, ty in zip(pdf["tx"], pdf["ty"]):
                lon, lat = _tile_lonlat_grid(int(tx), int(ty), z, 16)
                lat = np.clip(lat, -MAX_MERCATOR_LAT,
                              MAX_MERCATOR_LAT)
                e, nn = proj.forward(lon, lat)
                fx = (e - e0) / de
                fy = (n0 - nn) / dn
                # the bbox of a 16x16 SAMPLE of a smooth map misses
                # the true extremum between samples by up to
                # max|g''|h^2/8 per axis — which IS (up to the factor)
                # the max second difference of the sampled grid, so
                # measure it instead of assuming a curvature model:
                # the earlier closed form (d_px^2 * de / 8R) used de
                # for both axes (wrong for anisotropic pixels,
                # de != dn) and the earth radius for the curvature
                # scale (off ~12x near the Mercator clip in polar
                # stereographic), so valid coarse-resolution inputs
                # tripped the undersized-window guard.  /4 instead of
                # /8 absorbs the mixed partials; a fixed slack stays
                # for chord-vs-curve at the raster edge.
                fx2 = fx.reshape(16, 16)
                fy2 = fy.reshape(16, 16)

                def _d2max(g):
                    return max(
                        float(np.abs(np.diff(g, n=2, axis=0)).max()),
                        float(np.abs(np.diff(g, n=2, axis=1)).max()))

                margin = _MARGIN + int(math.ceil(
                    max(_d2max(fx2), _d2max(fy2)) / 4.0))
                sx0 = int(np.floor(fx.min())) - margin
                sx1 = int(np.ceil(fx.max())) + margin
                sy0 = int(np.floor(fy.min())) - margin
                sy1 = int(np.ceil(fy.max())) + margin
                sx0, sx1 = max(sx0, 0), min(sx1, xsize)
                sy0, sy1 = max(sy0, 0), min(sy1, ysize)
                if sx0 >= sx1 or sy0 >= sy1:
                    continue
                for bby in range(sy0 // B, (sy1 - 1) // B + 1):
                    for bbx in range(sx0 // B, (sx1 - 1) // B + 1):
                        out.append((tx, ty, bbx, bby,
                                    sx0, sy0, sx1, sy1))
            if out:
                yield pd.DataFrame(
                    out, columns=["tx", "ty", "bx", "by",
                                  "sx0", "sy0", "sx1", "sy1"])

    cov = keys.mapInPandas(
        cover, schema="tx long, ty long, bx int, by int, "
                      "sx0 int, sy0 int, sx1 int, sy1 int")
    cand = cov.join(blocks, ["bx", "by"])

    def sample(key, pdf):
        tx, ty = int(key[0]), int(key[1])
        sx0 = int(pdf["sx0"].iloc[0])
        sy0 = int(pdf["sy0"].iloc[0])
        sx1 = int(pdf["sx1"].iloc[0])
        sy1 = int(pdf["sy1"].iloc[0])
        region = np.zeros((sy1 - sy0, sx1 - sx0, 4), np.uint8)
        for bbx, bby, buf in zip(pdf["bx"], pdf["by"], pdf["px"]):
            blk = np.frombuffer(bytes(buf), np.uint8).reshape(B, B, 4)
            gx0, gy0 = int(bbx) * B, int(bby) * B
            rx0, ry0 = max(gx0, sx0), max(gy0, sy0)
            rx1 = min(gx0 + B, sx1)
            ry1 = min(gy0 + B, sy1)
            if rx0 >= rx1 or ry0 >= ry1:
                continue
            region[ry0 - sy0:ry1 - sy0, rx0 - sx0:rx1 - sx0] = \
                blk[ry0 - gy0:ry1 - gy0, rx0 - gx0:rx1 - gx0]

        side = TILE_SIDE
        nn_ = float(1 << z)
        px = tx + (np.arange(side) + 0.5) / side
        py = ty + (np.arange(side) + 0.5) / side
        gx, gy = np.meshgrid(px, py)
        lon = gx / nn_ * 360.0 - 180.0
        lat = np.degrees(np.arctan(np.sinh(
            math.pi * (1.0 - 2.0 * gy / nn_))))
        e, nnn = proj.forward(lon.ravel(), np.clip(
            lat, -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT).ravel())
        # float source-pixel-index space (u=0 at pixel-0 center)
        u = ((e - e0) / de - 0.5).reshape(side, side)
        v = ((n0 - nnn) / dn - 0.5).reshape(side, side)
        out = np.zeros((side, side, 4), np.uint8)
        inside = ((u >= -0.5) & (u <= xsize - 0.5)
                  & (v >= -0.5) & (v <= ysize - 0.5))
        ru = u - sx0
        rv = v - sy0
        h_r, w_r = region.shape[:2]
        # loud failure beats silent edge-pixel sampling: every pixel
        # inside the source raster must also fall inside the window
        # the cover kernel sized (the clips below are only for raster
        # -edge clamping, never window-edge)
        bad = inside & ((ru < -0.5 - 1e-6) | (ru > w_r - 0.5 + 1e-6)
                        | (rv < -0.5 - 1e-6)
                        | (rv > h_r - 0.5 + 1e-6))
        if bad.any():
            raise ValueError(
                f"reproject: undersized source window for tile "
                f"z{z}/{tx}/{ty}: window {w_r}x{h_r} at "
                f"({sx0},{sy0}), ru range "
                f"[{ru[inside].min():.1f},{ru[inside].max():.1f}], "
                f"rv range "
                f"[{rv[inside].min():.1f},{rv[inside].max():.1f}]")
        if interpolate == "near":
            iu = np.clip(np.rint(ru).astype(np.int64), 0, w_r - 1)
            iv = np.clip(np.rint(rv).astype(np.int64), 0, h_r - 1)
            out[inside] = region[iv[inside], iu[inside]]
        else:
            u0 = np.floor(ru).astype(np.int64)
            v0 = np.floor(rv).astype(np.int64)
            fu = (ru - u0)[..., None]
            fv = (rv - v0)[..., None]
            u0c = np.clip(u0, 0, w_r - 1)
            u1c = np.clip(u0 + 1, 0, w_r - 1)
            v0c = np.clip(v0, 0, h_r - 1)
            v1c = np.clip(v0 + 1, 0, h_r - 1)
            acc = (region[v0c, u0c].astype(np.float64)
                   * (1 - fu) * (1 - fv)
                   + region[v0c, u1c].astype(np.float64)
                   * fu * (1 - fv)
                   + region[v1c, u0c].astype(np.float64)
                   * (1 - fu) * fv
                   + region[v1c, u1c].astype(np.float64) * fu * fv)
            vals = np.rint(acc).astype(np.uint8)
            out[inside] = vals[inside]
        return pd.DataFrame(
            {"z": pd.Series([z], dtype="int32"),
             "x": pd.Series([tx], dtype="int64"),
             "y": pd.Series([(1 << z) - 1 - ty], dtype="int64"),  # TMS
             "px": [out.tobytes()]})

    return (cand.repartition(
        int(spark.sparkContext.defaultParallelism), "tx", "ty")
        .groupBy("tx", "ty")
        .applyInPandas(sample,
                       schema="z int, x long, y long, px binary"))


def mercator_meta_for_tiles(tiles: DataFrame):
    """Aligned EPSG:3857 RasterMeta for a native tile relation (the
    CLI Parquet branch's inference, shared with reprojection)."""
    from ..grid import SRS_MERCATOR, RasterMeta
    stats = tiles.agg(F.max("z"), F.min("x"), F.max("x"), F.min("y"),
                      F.max("y")).first()
    z = int(stats[0])
    world = SRS_MERCATOR.world_extents()
    tile_dim = SRS_MERCATOR.tile_dimensions(z)
    x0, x1 = int(stats[1]), int(stats[2]) + 1
    y0, y1 = int(stats[3]), int(stats[4]) + 1
    gt = (world.lower_left.x + x0 * tile_dim.x, tile_dim.x / TILE_SIDE,
          0.0, world.lower_left.y + y1 * tile_dim.y, 0.0,
          -tile_dim.y / TILE_SIDE)
    return RasterMeta((x1 - x0) * TILE_SIDE, (y1 - y0) * TILE_SIDE, gt)
