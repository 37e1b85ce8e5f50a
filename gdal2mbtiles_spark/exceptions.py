"""Engine exceptions.

Mirrors the error surface of the reference
(/root/reference/gdal2mbtiles/exceptions.py): callers of the tiling
planner must be able to catch the same alignment / validation errors the
reference raises (UnalignedInputError at gdal.py:697-702, ValueError for
resolution ranges at vips.py:1083-1134).
"""


class GdalError(Exception):
    """Raised when an input raster description is invalid."""


class UnalignedInputError(ValueError):
    """Input extents are not aligned to the TMS tile grid.

    Semantics per /root/reference/gdal2mbtiles/gdal.py:697-702: raised by
    ``tms_extents`` when the tiled extents differ from the true extents by
    more than one pixel.
    """


class VrtError(Exception):
    """Raised when a logical plan description is invalid."""
