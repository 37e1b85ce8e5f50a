"""Distributed raster reprojection: UTM -> Web-Mercator native tiles.

The reference handles foreign-SRS inputs by shelling to ``gdalwarp
-t_srs EPSG:3857`` before slicing (gdal.py:176-220, main.py:284-303).
This operator is the Spark-native analogue for WGS84 UTM sources
(proj.py's closed-form transverse Mercator): an INVERSE-MAPPING warp
— for every target tile pixel, project its lon/lat into the source
grid and sample — expressed as two Arrow-batched kernels around one
equi-join, the halo-exchange shape that scales to rasters far larger
than any single executor:

1. **cover** (mapInPandas over the target tile KEYS, no pixels): each
   target tile projects a boundary sample of itself into source pixel
   space and emits one id-only row per overlapped 256x256 source
   block, plus its source-window bbox.  The map is smooth, so a
   16-point boundary sample + a safety margin bounds the true window.
2. equi-join with the source block relation on (bx, by) — the only
   exchange that moves pixel payloads, each block replicated only to
   the target tiles that actually read it (the replication factor is
   ~(scale+1)^2, independent of raster size).
3. **sample** (applyInPandas per target tile): assemble the joined
   blocks into the tile's source window and run the vectorized
   near/bilinear inverse-mapping resample; pixels falling outside the
   source raster become transparent.

No driver-side pixel collection anywhere; the driver only computes
the target tile RANGE from the projected source boundary (O(edge
samples) numpy).
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cells import MAX_MERCATOR_LAT
from ..grid import TILE_SIDE
from ..proj import tm_forward, tm_inverse, utm_params

B = 256
EARTH_R = 6378137.0
_MARGIN = 4          # source-px safety margin over the boundary bbox


def _boundary_px(xsize: int, ysize: int, pts: int = 64
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Pixel coordinates sampling the raster boundary."""
    xs = np.linspace(0.0, float(xsize), pts)
    ys = np.linspace(0.0, float(ysize), pts)
    bx = np.concatenate([xs, xs, np.zeros(pts), np.full(pts, xsize)])
    by = np.concatenate([np.zeros(pts), np.full(pts, ysize), ys, ys])
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


def reproject_utm_to_tiles(spark: SparkSession, blocks: DataFrame,
                           geotransform: Tuple[float, ...],
                           xsize: int, ysize: int, epsg: int,
                           resolution: int = None,
                           interpolate: str = "near") -> DataFrame:
    """UTM source blocks -> native EPSG:3857 TMS tiles (z, x, y, px).

    geotransform: GDAL-style (E0, dE, 0, N0, 0, -dN) in UTM metres.
    interpolate: 'near' (gdalwarp's default) or 'bilinear'."""
    lon0, fn = utm_params(epsg)
    e0, de = float(geotransform[0]), float(geotransform[1])
    n0, dn = float(geotransform[3]), -float(geotransform[5])
    if interpolate not in ("near", "bilinear"):
        raise ValueError("reprojection kernels: near | bilinear, not "
                         f"{interpolate!r}")

    # driver: lon/lat bbox of the source boundary -> target tile range
    bpx, bpy = _boundary_px(xsize, ysize)
    lon_b, lat_b = tm_inverse(e0 + bpx * de, n0 - bpy * dn, lon0,
                              fn=fn)
    lat_b = np.clip(lat_b, -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT)
    z = (resolution if resolution is not None
         else pick_target_zoom(de, float(lat_b.mean())))
    n = 1 << z
    pad = 1e-9
    tx0 = int(np.clip(math.floor((lon_b.min() + 180.0) / 360.0 * n
                                 - pad), 0, n - 1))
    tx1 = int(np.clip(math.floor((lon_b.max() + 180.0) / 360.0 * n
                                 + pad), 0, n - 1))

    def _ty(lat: float) -> int:
        rad = math.radians(lat)
        t = (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad))
             / math.pi) / 2.0 * n
        return int(np.clip(math.floor(t), 0, n - 1))

    ty0, ty1 = _ty(float(lat_b.max())), _ty(float(lat_b.min()))

    w = tx1 - tx0 + 1
    keys = spark.range(w * (ty1 - ty0 + 1)).select(
        (F.lit(tx0) + F.col("id") % w).cast("long").alias("tx"),
        (F.lit(ty0) + (F.col("id") / w).cast("long")).cast("long")
        .alias("ty"))

    def cover(batches: Iterator[pd.DataFrame]
              ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for tx, ty in zip(pdf["tx"], pdf["ty"]):
                lon, lat = _tile_lonlat_grid(int(tx), int(ty), z, 16)
                lat = np.clip(lat, -MAX_MERCATOR_LAT,
                              MAX_MERCATOR_LAT)
                e, nn = tm_forward(lon, lat, lon0, fn=fn)
                fx = (e - e0) / de
                fy = (n0 - nn) / dn
                sx0 = int(np.floor(fx.min())) - _MARGIN
                sx1 = int(np.ceil(fx.max())) + _MARGIN
                sy0 = int(np.floor(fy.min())) - _MARGIN
                sy1 = int(np.ceil(fy.max())) + _MARGIN
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
        e, nnn = tm_forward(lon.ravel(), np.clip(
            lat, -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT).ravel(),
            lon0, fn=fn)
        # float source-pixel-index space (u=0 at pixel-0 center)
        u = ((e - e0) / de - 0.5).reshape(side, side)
        v = ((n0 - nnn) / dn - 0.5).reshape(side, side)
        out = np.zeros((side, side, 4), np.uint8)
        inside = ((u >= -0.5) & (u <= xsize - 0.5)
                  & (v >= -0.5) & (v <= ysize - 0.5))
        ru = u - sx0
        rv = v - sy0
        h_r, w_r = region.shape[:2]
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
