"""CLI: convert a raster description into an MBTiles file on Spark.

Mirrors the reference's argument surface and validation semantics
(main.py:63-233): same option names, same error messages for --color /
--coloring / --colorize-band / --png8, same OUTPUT/name defaulting
rules.  The INPUT differs by design: instead of a GDAL file the engine
reads either

- a JSON *raster descriptor* ``{"kind": "synthetic", "xsize":...,
  "ysize":..., "epsg": 3857, "pattern": "gradient"}`` (the test
  fixtures), or
- a Parquet directory of tiles ``(z, x, y, px)`` produced by another
  stage (e.g. a burn job),

because the execution substrate is a Spark cluster, not a local GDAL
install.  Run under spark-submit:

    spark-submit --py-files gdal2mbtiles_spark.zip \
        -m gdal2mbtiles_spark.cli input.json output.mbtiles
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

from .colors import ColorExact, ColorGradient, ColorPalette, rgba

COLORING_METHODS = {
    "exact": ColorExact,
    "gradient": ColorGradient,
    "palette": ColorPalette,
}

# same surface as the reference's gdal.py:65-71 RESAMPLING_METHODS
RESAMPLING_METHODS = ["near", "bilinear", "cubic", "cubicspline",
                      "lanczos"]

# the CLI's grid SRSs (reference accepts any gdalwarp -t_srs; this
# engine's closed-form grid math covers the two tile profiles)
SUPPORTED_EPSG = (3857, 4326)


def color_arg(s: str):
    """--color validation (reference main.py:71-92, same messages)."""
    try:
        band_value, html_color = s.split(":", 1)
    except ValueError:
        raise argparse.ArgumentTypeError(
            "'{0}' must be in format: BAND-VALUE:HTML-COLOR".format(s))
    try:
        band_value = float(band_value)
    except ValueError:
        raise argparse.ArgumentTypeError(
            "'{0}' is not a valid number".format(band_value))
    try:
        color = rgba.webcolor(html_color)
    except ValueError:
        raise argparse.ArgumentTypeError(
            "'{0}' is not a valid HTML color".format(html_color))
    return band_value, color


def colorize_band_arg(s: str) -> int:
    try:
        result = int(s)
    except ValueError:
        raise argparse.ArgumentTypeError(
            "invalid int value: '{0}'".format(s))
    if result <= 0:
        raise argparse.ArgumentTypeError(
            "'{0}' must be 1 or greater".format(s))
    return result


def png8_arg(s):
    if s is None:
        return None
    try:
        result = int(s)
    except ValueError:
        raise argparse.ArgumentTypeError(
            "invalid int value: '{0}'".format(s))
    if not 2 <= result <= 256:
        # ArgumentTypeError so argparse surfaces THIS message (a bare
        # ValueError is swallowed into a generic "invalid value")
        raise argparse.ArgumentTypeError(
            "png8 must be between 2 and 256: {0!r}".format(result))
    return result


def parse_args(args):
    parser = argparse.ArgumentParser(
        description="Converts a raster description into an MBTiles "
                    "file on Spark")
    parser.add_argument("-v", "--verbose", action="count",
                        help="explain what is being done")

    group = parser.add_argument_group(title="Positional arguments")
    group.add_argument("INPUT", nargs="?",
                       help="Raster descriptor JSON or tiles Parquet.")
    group.add_argument("OUTPUT", nargs="?",
                       help="Output filename. Defaults to "
                            "INPUT.mbtiles")

    group = parser.add_argument_group(title="MBTiles metadata arguments")
    group.add_argument("--name", default=None)
    group.add_argument("--description", default="")
    group.add_argument("--layer-type", default="overlay",
                       choices=("baselayer", "overlay"))
    group.add_argument("--version", default="1.0.0")
    group.add_argument("--format", default="png",
                       choices=("jpg", "png"))

    group = parser.add_argument_group(title="Warp arguments")
    group.add_argument("--spatial-reference", type=int, default=3857)
    # default None (not "near"): an off-scale same-SRS input that the
    # user did not pass -r for must use the reference's VIPS ratio rule
    # (stretch/near when upsampling, shrink/bilinear when downsampling,
    # vips.py:569-578) rather than forcing nearest — only an explicit
    # -r pins the kernel (round-3 ADVICE)
    group.add_argument("--resampling", default=None,
                       choices=RESAMPLING_METHODS)

    group = parser.add_argument_group(title="Rendering arguments")
    group.add_argument("--min-resolution", type=int, default=None)
    group.add_argument("--max-resolution", type=int, default=None)
    group.add_argument("--fill-borders", action="store_const",
                       const=True, default=True)
    group.add_argument("--no-fill-borders", dest="fill_borders",
                       action="store_const", const=False)
    group.add_argument("--zoom-offset", type=int, default=0,
                       metavar="N")

    group = parser.add_argument_group(title="Coloring arguments")
    group.add_argument("--coloring", default=None,
                       choices=COLORING_METHODS)
    group.add_argument("--color", dest="colors", action="append",
                       type=color_arg, metavar="BAND-VALUE:HTML-COLOR")
    group.add_argument("--colorize-band", metavar="COLORIZE-BAND",
                       type=colorize_band_arg, default=None)
    group.add_argument("--png8", default=None, type=png8_arg)

    group = parser.add_argument_group(title="Spark arguments")
    group.add_argument("--cores", type=int, default=None)

    args = parser.parse_args(args=args)

    if args.INPUT is None:
        parser.error("INPUT is required")
    if args.OUTPUT is None:
        args.OUTPUT = os.path.splitext(args.INPUT)[0] + ".mbtiles"
    if args.name is None:
        args.name = os.path.basename(args.INPUT)

    # --color / --coloring pairing rules (main.py:225-231)
    if args.coloring is None and (args.colors
                                  or args.colorize_band is not None):
        parser.error("must provide --coloring")
    elif args.coloring is not None and not args.colors:
        parser.error("must provide at least one --color")
    if args.coloring is not None:
        args.coloring = COLORING_METHODS[args.coloring]
    return args


def _synth_blocks(spark, desc):
    """Driver-synthesized gradient source for "synthetic" warp
    descriptors, bounded so the driver never holds a huge array
    (larger rasters arrive as Parquet blocks via kind "blocks")."""
    if desc["xsize"] * desc["ysize"] > 8192 * 8192:
        raise SystemExit(
            "synthetic warp descriptors are bounded at 8192x8192 "
            "(driver-side synthesis); larger rasters should arrive "
            'as Parquet blocks (descriptor kind "blocks" with a '
            '"path")')
    import numpy as np

    from .operators.resample import blocks_from_array
    from .sources.rasters import gradient_pixels
    gx, gy = np.meshgrid(np.arange(desc["xsize"]),
                         np.arange(desc["ysize"]))
    return blocks_from_array(spark, gradient_pixels(gx, gy))


def load_tiles(spark, args):
    """INPUT -> (native tiles DataFrame, RasterMeta, warped: bool).

    Tile-aligned descriptors slice directly (native_tiles).  An
    unaligned / off-scale descriptor takes the WARP path: the source
    image is synthesized from the same deterministic pattern, carried
    as 256x256 blocks, and resampled + grid-aligned by warp_plan with
    the CLI's --resampling kernel — the engine-side analogue of the
    reference shelling to ``gdalwarp -r`` before slicing
    (gdal.py:176-220, main.py:284-303)."""
    from .exceptions import UnalignedInputError
    from .grid import GridSRS, RasterMeta, whole_world_raster_meta
    from .sources.rasters import native_tiles

    if args.INPUT.endswith(".json"):
        with open(args.INPUT) as fh:
            desc = json.load(fh)
        if desc.get("kind") not in ("synthetic", "blocks"):
            raise ValueError(f"unknown raster kind: {desc.get('kind')}")
        epsg = desc.get("epsg", args.spatial_reference)
        from .proj import is_supported_epsg
        if desc["kind"] == "blocks" or (epsg not in SUPPORTED_EPSG
                                        and is_supported_epsg(epsg)):
            # foreign-SRS warp path (reference: gdalwarp -t_srs
            # EPSG:3857, gdal.py:176-220) — closed-form TM/LCC +
            # distributed inverse-mapping warp.  Two source shapes:
            # "synthetic" (driver-synthesized gradient, bounded) and
            # "blocks" (a Parquet directory of (bx, by, px) 256x256
            # blocks + sidecar geotransform in the descriptor — the
            # scale path, bounded only by the cluster).
            if not is_supported_epsg(epsg):
                raise SystemExit(
                    f"EPSG:{epsg} has no closed-form projection "
                    "(supported: UTM 326xx/327xx, ETRS89 UTM 258xx, "
                    "LCC 2154/3347/26985, polar stereo "
                    "3413/3031/3032, Albers 5070)")
            if args.spatial_reference != 3857:
                raise SystemExit(
                    f"foreign-SRS sources reproject to EPSG:3857 "
                    f"only; --spatial-reference "
                    f"{args.spatial_reference} is not a supported "
                    "warp target")
            if "geotransform" not in desc:
                raise SystemExit(
                    "foreign-SRS descriptors require a geotransform "
                    "(E0, dE, 0, N0, 0, -dN) in metres")
            required = ["xsize", "ysize"]
            if desc["kind"] == "blocks":
                required.append("path")
            missing = [k2 for k2 in required if k2 not in desc]
            if missing:
                raise SystemExit(
                    f'descriptor kind "{desc["kind"]}" requires '
                    "keys: " + ", ".join(missing))
            if args.resampling not in (None, "near", "bilinear"):
                raise SystemExit(
                    f"--resampling {args.resampling} is not available "
                    "on the reprojection path (near | bilinear)")
            from .operators.reproject import (mercator_meta_for_tiles,
                                              reproject_to_tiles)
            if desc["kind"] == "blocks":
                blocks = spark.read.parquet(desc["path"])
            else:
                blocks = _synth_blocks(spark, desc)
            tiles = reproject_to_tiles(
                spark, blocks, tuple(desc["geotransform"]),
                desc["xsize"], desc["ysize"], epsg,
                resolution=desc.get("resolution"),
                interpolate=args.resampling or "near")
            tiles = tiles.localCheckpoint(eager=True)
            return tiles, mercator_meta_for_tiles(tiles), True
        if epsg != args.spatial_reference:
            raise SystemExit(
                f"descriptor is pre-projected EPSG:{epsg} but "
                f"--spatial-reference {args.spatial_reference} was "
                "requested: the CLI does not reproject (reproject the "
                "descriptor, or use the warp_mbtiles API)")
        if "geotransform" in desc:
            meta = RasterMeta(desc["xsize"], desc["ysize"],
                              tuple(desc["geotransform"]),
                              srs=GridSRS(epsg))
        else:
            meta = whole_world_raster_meta(
                desc["xsize"], desc["ysize"], srs=GridSRS(epsg))
        try:
            from .grid import XY
            if meta.scaling_ratios() == XY(1.0, 1.0):
                meta.tms_extents()
                return native_tiles(spark, meta), meta, False
        except (UnalignedInputError, AssertionError):
            pass
        # warp path: synthesize the unaligned source image and warp it
        from .helpers import warp_plan
        blocks = _synth_blocks(spark, desc)
        tiles, meta = warp_plan(spark, blocks, meta,
                                interpolate=args.resampling)
        return tiles, meta, True
    # Parquet tiles: infer native z and extents from the data
    if args.spatial_reference != 3857:
        raise SystemExit(
            "Parquet tile inputs are EPSG:3857 tile grids; "
            f"--spatial-reference {args.spatial_reference} is not "
            "applicable")
    tiles = spark.read.parquet(args.INPUT)
    from pyspark.sql import functions as F
    stats = tiles.agg(F.max("z"), F.min("x"), F.max("x"), F.min("y"),
                      F.max("y")).first()
    if stats[0] is None:
        raise SystemExit(f"Parquet tile input is empty: {args.INPUT}")
    z = int(stats[0])
    from .grid import SRS_MERCATOR, RasterMeta, TILE_SIDE
    world = SRS_MERCATOR.world_extents()
    tile_dim = SRS_MERCATOR.tile_dimensions(z)
    x0, x1 = int(stats[1]), int(stats[2]) + 1
    y0, y1 = int(stats[3]), int(stats[4]) + 1
    gt = (world.lower_left.x + x0 * tile_dim.x, tile_dim.x / TILE_SIDE,
          0.0, world.lower_left.y + y1 * tile_dim.y, 0.0,
          -tile_dim.y / TILE_SIDE)
    meta = RasterMeta((x1 - x0) * TILE_SIDE, (y1 - y0) * TILE_SIDE, gt)
    return tiles.where(F.col("z") == z), meta, False


def main(argv: Optional[list] = None) -> int:
    args = parse_args(sys.argv[1:] if argv is None else argv)
    from .helpers import image_mbtiles
    from .renderers import JpegRenderer, PngRenderer
    from .session import get_spark

    if args.spatial_reference not in SUPPORTED_EPSG:
        raise SystemExit(
            f"--spatial-reference {args.spatial_reference} is not "
            f"supported: the CLI's grid math covers EPSG "
            f"{SUPPORTED_EPSG} (Mercator XYZ and geodetic profiles)")

    spark = get_spark(cores=args.cores, app="gdal2mbtiles_spark-cli")
    tiles, meta, warped = load_tiles(spark, args)
    # tile-aligned inputs never resample, so a non-default kernel
    # would be a silent no-op — reject it loudly (the warp path above
    # applies it for real); an explicit -r near is accepted as the
    # harmless default
    if not warped and args.resampling not in (None, "near"):
        raise SystemExit(
            f"--resampling {args.resampling} has no effect on "
            "tile-aligned CLI inputs; pass an unaligned descriptor "
            "(warp path) or use the warp_mbtiles API")

    # coloring: extract the band, compile the color ramp, colorize —
    # the reference threads these through warp_mbtiles
    # (main.py:288-295); here the pieces compose on the tile relation
    if args.coloring is not None:
        from .colors import colorize_tiles
        from .operators.bands import extract_band
        colors = args.coloring(dict(args.colors))
        band = args.colorize_band if args.colorize_band is not None else 1
        tiles = colorize_tiles(extract_band(tiles, band), colors,
                               dtype="uint8")

    # pass the validated palette size through unchanged: --png8 N must
    # quantize to N colors, not be collapsed to a boolean
    renderer = (JpegRenderer() if args.format == "jpg"
                else PngRenderer(
                    png8=args.png8 if args.png8 is not None else False))
    metadata = dict(name=args.name, description=args.description,
                    type=args.layer_type, version=args.version,
                    format=args.format)
    f = image_mbtiles(spark, tiles, meta, args.OUTPUT, metadata,
                      min_resolution=args.min_resolution,
                      max_resolution=args.max_resolution,
                      fill_borders=args.fill_borders,
                      zoom_offset=args.zoom_offset,
                      renderer=renderer)
    f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
