"""spark-submit --py-files deployment contract: the package must be
fully importable from a zip (zipimport) with no filesystem-relative
package-data reads.  This is how the north rule's multi-executor
cluster receives the engine (README "On a cluster"); a module that
opens files relative to __file__ at import- or call-time would break
only there, so we prove the library boundary works from a zip in a
fresh interpreter whose sys.path contains ONLY the zip + stdlib
defaults (reference analogue: the pip-installable package surface,
/root/reference/setup.py:1-60).
"""

import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "gdal2mbtiles_spark"

# the pure-python library boundary: everything importable and
# callable WITHOUT a JVM.  Spark-plan modules (operators/, sources/
# that import pyspark) are exercised from the zip import-only.
DRIVE = r"""
import sys
zip_path = sys.argv[1]
sys.path.insert(0, zip_path)

# import the whole package surface from the zip
import gdal2mbtiles_spark
from gdal2mbtiles_spark.grid import whole_world_raster_meta
from gdal2mbtiles_spark import cells, colors, grid, helpers, jpeg, proj
from gdal2mbtiles_spark.functions import tilemath, hashing, text
from gdal2mbtiles_spark.operators import (bands, burn, dedup,
                                          multimodal, pyramid,
                                          reproject, resample,
                                          similarity, sparse, spatial)
from gdal2mbtiles_spark.sources import avro, iceberg, pages

# every module must resolve inside the zip, not the repo checkout
for m in [gdal2mbtiles_spark, cells, grid, tilemath, spatial, avro]:
    f = getattr(m, "__file__", "") or ""
    assert zip_path in f, (m.__name__, f)

# and the pure library must COMPUTE from the zip, not just import
import numpy as np
meta = whole_world_raster_meta(1024, 1024)
assert meta.native_resolution() == 2
e, n = proj.tm_forward(np.array([2.3522]), np.array([48.8566]), lon0=3.0)
assert abs(e[0] - 452482.53) < 0.1 and abs(n[0] - 5411717.18) < 0.1, (e, n)
assert "floor" in tilemath.tile_x_sql("lon", 11).lower()
print("ZIPOK")
"""


@pytest.fixture(scope="module")
def pkg_zip(tmp_path_factory):
    path = tmp_path_factory.mktemp("pyfiles") / "gdal2mbtiles_spark.zip"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return str(path)


def test_package_imports_and_computes_from_zip(pkg_zip, tmp_path):
    """Fresh interpreter, cwd OUTSIDE the repo, repo NOT on sys.path:
    the zip alone must supply the package."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", DRIVE, pkg_zip],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIPOK" in out.stdout


def test_zip_contains_no_data_files(pkg_zip):
    """The engine ships code only — any non-.py package data would
    need importlib.resources plumbing that zipimport + --py-files
    does not get for free, so its absence is the contract."""
    with zipfile.ZipFile(pkg_zip) as zf:
        non_py = [n for n in zf.namelist()
                  if not n.endswith(".py") and not n.endswith("/")]
    assert non_py == [], non_py
