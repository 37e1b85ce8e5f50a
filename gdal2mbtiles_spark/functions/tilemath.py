"""Column-expression tile/cell math: geocode, XYZ/TMS keys, cell ids.

Everything here is a pure JVM-side Column expression (whole-stage
codegen, no Python in the hot path) with an exactly matching ANSI-SQL
text emitted by the ``*_sql`` twins so the DuckDB oracle computes
bit-identical doubles (same IEEE expression tree on both engines).

- F15 lon/lat -> XYZ tile + TMS flip (slippy formula, consistent with
  grid.py / reference gdal.py:886-905, TMS flip per vips.py:771-775)
- F16 deterministic geocode: md5(url) -> lon/lat (FIXTURES.md §1)
- F14 cell encode: (res, x, y) packed by plain arithmetic (cells.py)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..cells import DEFAULT_RES, MAX_MERCATOR_LAT, RES_SHIFT, X_SHIFT

TWO32 = 4294967296.0


# --- deterministic geocode (F16) -----------------------------------------

def geo_lon(url: Column) -> Column:
    """lon = (int(md5(url)[0:8],16) / 2^32) * 360 - 180"""
    h = F.conv(F.substring(F.md5(url), 1, 8), 16, 10).cast("long")
    return h / F.lit(TWO32) * F.lit(360.0) - F.lit(180.0)


def geo_lat(url: Column) -> Column:
    """lat = (int(md5(url)[8:16],16) / 2^32) * 170.1022 - 85.0511"""
    h = F.conv(F.substring(F.md5(url), 9, 8), 16, 10).cast("long")
    return h / F.lit(TWO32) * F.lit(170.1022) - F.lit(85.0511)


def geo_lon_sql(url_expr: str) -> str:
    return (f"(('0x' || substr(md5({url_expr}), 1, 8))::BIGINT"
            f" / 4294967296.0 * 360.0 - 180.0)")


def geo_lat_sql(url_expr: str) -> str:
    return (f"(('0x' || substr(md5({url_expr}), 9, 8))::BIGINT"
            f" / 4294967296.0 * 170.1022 - 85.0511)")


# --- slippy tile keys (F15) -----------------------------------------------

def tile_x(lon: Column, z: int) -> Column:
    n = float(1 << z)
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    return F.least(F.greatest(raw, F.lit(0)),
                   F.lit(int(n) - 1)).cast("long")


def _lat_clamped(lat: Column) -> Column:
    return F.least(F.greatest(lat, F.lit(-MAX_MERCATOR_LAT)),
                   F.lit(MAX_MERCATOR_LAT))


def tile_y_xyz(lat: Column, z: int) -> Column:
    """y-down (XYZ/slippy) tile row."""
    n = float(1 << z)
    rad = F.radians(_lat_clamped(lat))
    raw = F.floor((F.lit(1.0)
                   - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
                   / F.lit(float(__import__("math").pi)))
                  / F.lit(2.0) * F.lit(n))
    return F.least(F.greatest(raw, F.lit(0)),
                   F.lit(int(n) - 1)).cast("long")


def tile_y_tms(lat: Column, z: int) -> Column:
    """TMS y-up row: 2^z - 1 - y_xyz (the vips.py:771-775 flip)."""
    return F.lit((1 << z) - 1) - tile_y_xyz(lat, z)


def tile_x_sql(lon_expr: str, z: int) -> str:
    n = 1 << z
    return (f"least(greatest(floor(({lon_expr} + 180.0) / 360.0 "
            f"* {float(n)!r}), 0), {n - 1})::BIGINT")


def _lat_clamped_sql(lat_expr: str) -> str:
    return (f"least(greatest({lat_expr}, {-MAX_MERCATOR_LAT!r}), "
            f"{MAX_MERCATOR_LAT!r})")


def tile_y_xyz_sql(lat_expr: str, z: int) -> str:
    n = 1 << z
    rad = f"radians({_lat_clamped_sql(lat_expr)})"
    return (f"least(greatest(floor((1.0 - ln(tan({rad}) + 1.0 / "
            f"cos({rad})) / pi()) / 2.0 * {float(n)!r}), 0), "
            f"{n - 1})::BIGINT")


def tile_y_tms_sql(lat_expr: str, z: int) -> str:
    return f"({(1 << z) - 1} - {tile_y_xyz_sql(lat_expr, z)})"


# --- cell ids (F14) ---------------------------------------------------------

def cell_id(lon: Column, lat: Column, res: int = DEFAULT_RES) -> Column:
    """Quadtree cell id = res*2^58 + x*2^29 + y_xyz (cells.py packing)."""
    return (F.lit(res * RES_SHIFT)
            + tile_x(lon, res) * F.lit(X_SHIFT)
            + tile_y_xyz(lat, res)).cast("long")


def cell_id_sql(lon_expr: str, lat_expr: str,
                res: int = DEFAULT_RES) -> str:
    return (f"({res * RES_SHIFT} + {tile_x_sql(lon_expr, res)} "
            f"* {X_SHIFT} + {tile_y_xyz_sql(lat_expr, res)})::BIGINT")
