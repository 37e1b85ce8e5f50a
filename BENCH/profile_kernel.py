"""Offline profiler for the phase-kernel (guide §1: measure first).

Step 1 (spark): materialize the z10 heat pixels the bench's
pyramid_full feeds into pyramid_phase_rendered, save to /tmp.
Step 2 (pure python): run the REAL kernel (sparse._phase_kernel) over
one simulated task's rows under cProfile, so the per-tile cost
decomposes into md5 / encode / paint / loop overhead without Spark in
the way.

Usage:
    python BENCH/profile_kernel.py extract   # once (writes /tmp/px_z10.parquet)
    python BENCH/profile_kernel.py profile [npart] [part_idx]
"""
import cProfile
import io
import pstats
import sys
import time

import numpy as np
import pandas as pd

Z = 10
OUT = "/tmp/px_z10.parquet"


def extract():
    from gdal2mbtiles_spark.session import get_spark
    from gdal2mbtiles_spark.operators.burn import pixel_histogram
    from gdal2mbtiles_spark.operators.sparse import heat_pixels
    from gdal2mbtiles_spark.sources.pages import synth_pages, with_geo

    spark = get_spark(cores=16, app="profile-extract")
    pages = with_geo(synth_pages(spark, 2_000_000), tile_z=Z)
    hist = pixel_histogram(pages, z=Z)
    px = heat_pixels(hist, Z)
    pdf = px.toPandas()
    pdf.to_parquet(OUT)
    print(f"saved {len(pdf)} pixel rows -> {OUT}")
    spark.stop()


def profile(npart=64, part=0, phase_depth=5):
    from gdal2mbtiles_spark.operators.sparse import _phase_kernel
    from gdal2mbtiles_spark.renderers import PngRenderer

    pdf = pd.read_parquet(OUT)
    top, bottom = Z, Z - phase_depth + 1
    shift = 8 + (top - bottom)
    ax = (pdf["gx"].to_numpy() >> shift)
    ay = (pdf["gy"].to_numpy() >> shift)
    key = (ax * 31 + ay) % npart
    sel = pdf[key == part].reset_index(drop=True)
    print(f"partition {part}/{npart}: {len(sel)} pixel rows")
    renderer = PngRenderer(compression=1)

    kernel_fn = _phase_kernel(top, bottom, renderer,
                              emit_pixels=(bottom > 0))

    t0 = time.time()
    pr = cProfile.Profile()
    pr.enable()
    n_rows = 0
    for chunk in kernel_fn(iter([sel])):
        n_rows += len(chunk)
    pr.disable()
    dt = time.time() - t0
    print(f"kernel: {n_rows} out rows in {dt:.2f}s")
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
    ps.print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    if sys.argv[1] == "extract":
        extract()
    else:
        npart = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        part = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        profile(npart, part)
