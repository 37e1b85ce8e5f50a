"""High-level compositions mirroring the reference's helpers
(helpers.py:32-155: image_mbtiles / image_pyramid / image_slice) with
DataFrame plumbing.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .grid import CoordTransform, RasterMeta, SRS_WGS84
from .mbtiles import MBTilesFile, write_mbtiles
from .operators.pyramid import (border_keys, dedup_tiles, pyramid_tiles,
                                render_images, union_levels)
from .renderers import PngRenderer


def warp_plan(spark: SparkSession, blocks: DataFrame, meta: RasterMeta,
              resolution=None, to_world: bool = False,
              interpolate: str = None):
    """The preprocess composition (reference gdal.py:86-120 +
    helpers.py:314-327 resample_after_warp): resample to the native
    grid, then align to the tile grid, then slice to native TMS
    tiles.  Input is a block image (operators.resample relation);
    output is (native tiles DataFrame, aligned RasterMeta).
    interpolate overrides the ratio-based kernel pick (the
    ``gdalwarp -r`` analogue; see resample_blocks)."""
    from .operators.resample import (align_to_grid_blocks,
                                     blocks_to_tiles, resample_blocks)
    blocks, meta = resample_blocks(blocks, meta, resolution=resolution,
                                   to_world=to_world,
                                   interpolate=interpolate)
    blocks, meta = align_to_grid_blocks(blocks, meta,
                                        resolution=resolution)
    return blocks_to_tiles(blocks, meta, resolution=resolution), meta


def warp_mbtiles(spark: SparkSession, blocks: DataFrame,
                 meta: RasterMeta, outputfile: str, metadata,
                 min_resolution=None, max_resolution=None,
                 fill_borders: bool = True, zoom_offset: int = 0,
                 renderer=None, interpolate: str = None) -> "MBTilesFile":
    """warp + image_mbtiles (reference helpers.py:158-211): accept any
    (possibly unaligned, non-native-scale) block raster."""
    tiles, meta2 = warp_plan(spark, blocks, meta,
                             interpolate=interpolate)
    return image_mbtiles(spark, tiles, meta2, outputfile, metadata,
                         min_resolution=min_resolution,
                         max_resolution=max_resolution,
                         fill_borders=fill_borders,
                         zoom_offset=zoom_offset, renderer=renderer)


def warp_pyramid(spark: SparkSession, blocks: DataFrame,
                 meta: RasterMeta, outputdir: str,
                 min_resolution=None, max_resolution=None,
                 fill_borders: bool = True, renderer=None) -> None:
    """warp + image_pyramid (reference helpers.py:214-262)."""
    tiles, meta2 = warp_plan(spark, blocks, meta)
    image_pyramid(spark, tiles, meta2, outputdir,
                  min_resolution=min_resolution,
                  max_resolution=max_resolution,
                  fill_borders=fill_borders, renderer=renderer)


def warp_slice(spark: SparkSession, blocks: DataFrame,
               meta: RasterMeta, outputdir: str,
               fill_borders: bool = True, renderer=None) -> None:
    """warp + image_slice (reference helpers.py:265-309)."""
    tiles, meta2 = warp_plan(spark, blocks, meta)
    image_slice(spark, tiles, meta2, outputdir,
                fill_borders=fill_borders, renderer=renderer)


def slice_plan(spark: SparkSession, native: DataFrame, meta: RasterMeta,
               min_resolution: Optional[int] = None,
               max_resolution: Optional[int] = None,
               fill_borders: bool = True,
               zoom_offset: int = 0
               ) -> Tuple[DataFrame, DataFrame]:
    """Build the full (images, map) pair for a pyramid slice —
    the distributed core of image_mbtiles/image_pyramid/image_slice."""
    levels = pyramid_tiles(spark, native, meta,
                           min_resolution=min_resolution,
                           max_resolution=max_resolution)
    all_tiles = union_levels(levels)
    borders = None
    if fill_borders:
        per_level = [border_keys(spark, meta, z) for z in sorted(levels)]
        borders = per_level[0]
        for b in per_level[1:]:
            borders = borders.unionByName(b)
    return dedup_tiles(spark, all_tiles, borders=borders,
                       zoom_offset=zoom_offset)


def image_mbtiles(spark: SparkSession, native: DataFrame,
                  meta: RasterMeta, outputfile: str,
                  metadata: Dict[str, str],
                  min_resolution: Optional[int] = None,
                  max_resolution: Optional[int] = None,
                  fill_borders: bool = True,
                  zoom_offset: int = 0,
                  renderer=None) -> MBTilesFile:
    """Slice a tile DataFrame into an .mbtiles file
    (reference helpers.py:32-87).

    Adds the post-import metadata: EPSG:4326 ``bounds`` from the tiled
    extents (storages.py:260-271) and x-minzoom/x-maxzoom
    (helpers.py:78-87)."""
    if renderer is None:
        renderer = PngRenderer()
    images, map_df = slice_plan(spark, native, meta,
                                min_resolution=min_resolution,
                                max_resolution=max_resolution,
                                fill_borders=fill_borders,
                                zoom_offset=zoom_offset)
    encoded = render_images(images, renderer)
    f = write_mbtiles(outputfile, encoded, map_df, metadata)

    native_z = meta.native_resolution()
    lo = native_z if min_resolution is None else min_resolution
    hi = native_z if max_resolution is None else max_resolution
    t = CoordTransform(meta.srs, SRS_WGS84)
    ll, ur = meta.tiled_extents(transform=t)
    f.set_metadata("bounds", (ll.x, ll.y, ur.x, ur.y))
    f.set_metadata("x-minzoom", lo + zoom_offset)
    f.set_metadata("x-maxzoom", hi + zoom_offset)
    return f


def image_pyramid(spark: SparkSession, native: DataFrame,
                  meta: RasterMeta, outputdir: str,
                  min_resolution: Optional[int] = None,
                  max_resolution: Optional[int] = None,
                  fill_borders: bool = True,
                  renderer=None) -> None:
    """Slice into a z/x/y.png static-site layout (reference
    helpers.py:90-122, NestedFileStorage storages.py:152-188).

    The deduped images are joined back and written executor-side via
    foreachPartition — the K2 sink."""
    if renderer is None:
        renderer = PngRenderer()
    images, map_df = slice_plan(spark, native, meta,
                                min_resolution=min_resolution,
                                max_resolution=max_resolution,
                                fill_borders=fill_borders)
    encoded = render_images(images, renderer)
    full = map_df.join(encoded, "tile_id", "inner")
    suffix = renderer.suffix
    os.makedirs(outputdir, exist_ok=True)

    def write_partition(rows):
        for row in rows:
            d = os.path.join(outputdir, str(row["zoom_level"]),
                             str(row["tile_column"]))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(
                    d, f"{row['tile_row']}{suffix}"), "wb") as fh:
                fh.write(bytes(row["tile_data"]))

    full.foreachPartition(write_partition)


def image_slice(spark: SparkSession, native: DataFrame, meta: RasterMeta,
                outputdir: str, fill_borders: bool = True,
                renderer=None) -> None:
    """Single-resolution slice with hash-named files (reference
    helpers.py:125-155, SimpleFileStorage z-x-y-hash.png).  The
    symlink-dedup structure becomes a manifest: every (z,x,y) carries
    its hash in the filename; payloads are written once per hash."""
    if renderer is None:
        renderer = PngRenderer()
    images, map_df = slice_plan(spark, native, meta, fill_borders=fill_borders)
    encoded = render_images(images, renderer)
    # Canonical coordinate per hash = the FIRST tile the reference's
    # sequential raster scan would have seen (top image row first, so
    # max TMS y, then min x) — reproduces which file is real vs link
    # (tests/test_storages.py:56-80: 2-0-1 real, 2-1-0 link).
    scan_order = F.struct(F.col("zoom_level"),
                          (-F.col("tile_row")).alias("ny"),
                          F.col("tile_column"))
    canon = (map_df.groupBy("tile_id")
             .agg(F.min_by(F.struct("zoom_level", "tile_column",
                                    "tile_row"), scan_order).alias("c")))
    full = map_df.join(canon, "tile_id").join(encoded, "tile_id")
    suffix = renderer.suffix
    os.makedirs(outputdir, exist_ok=True)

    def write_partition(rows):
        for row in rows:
            # %x of the 128-bit int: hex without leading zeros
            # (SimpleFileStorage.filepath, storages.py:105-108)
            hashed = int(row["tile_hex"], 16)
            z, x, y = (row["zoom_level"], row["tile_column"],
                       row["tile_row"])
            c = row["c"]
            name = f"{z}-{x}-{y}-{hashed:x}{suffix}"
            path = os.path.join(outputdir, name)
            if (z, x, y) == (c["zoom_level"], c["tile_column"],
                             c["tile_row"]):
                with open(path, "wb") as fh:
                    fh.write(bytes(row["tile_data"]))
            else:
                # duplicate -> relative symlink to the canonical file;
                # dangling-until-written is fine, so partition order
                # doesn't matter (storages.py:119-138 semantics)
                target = (f"{c['zoom_level']}-{c['tile_column']}-"
                          f"{c['tile_row']}-{hashed:x}{suffix}")
                if not os.path.lexists(path):
                    os.symlink(target, path)

    full.foreachPartition(write_partition)
