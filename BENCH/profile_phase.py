"""Decompose the z12 phase-1 serial floor: run ONLY the first fused
kernel pass (burn histogram -> pyramid_phase_rendered[12..8] ->
localCheckpoint) at local[N] with the UI on, then pull per-stage task
metrics from the REST API — task-time sum vs wall isolates straggler
tails / GC / scheduler gaps from true serial compute.

Usage: SPARK_GRAFT_CPUS=32 python BENCH/profile_phase.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from gdal2mbtiles_spark.session import get_spark                 # noqa: E402
from gdal2mbtiles_spark.operators.burn import pixel_histogram    # noqa: E402
from gdal2mbtiles_spark.operators.sparse import (                # noqa: E402
    heat_pixels, pyramid_phase_rendered)
from gdal2mbtiles_spark.renderers import PngRenderer             # noqa: E402
from gdal2mbtiles_spark.sources.pages import (synth_pages,       # noqa: E402
                                              with_geo)

Z = int(os.environ.get("SPARK_GRAFT_BURN_Z", "12"))
PAGES_N = int(os.environ.get("SPARK_GRAFT_PAGES_N", "2000000"))


def main():
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cores, app="phase-profile",
                      shuffle_partitions=2 * cores, ui=True)
    pages = with_geo(synth_pages(spark, PAGES_N), tile_z=Z)
    hist = pixel_histogram(pages, z=Z)
    pixels = heat_pixels(hist, Z)
    t0 = time.time()
    out = pyramid_phase_rendered(pixels, Z, Z - 4, PngRenderer(1),
                                 emit_pixels=True)
    out = out.localCheckpoint(eager=True)
    wall = time.time() - t0
    n = out.count()

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    stages = json.loads(urllib.request.urlopen(
        base + "/stages?status=complete").read())
    rows = []
    for s in sorted(stages, key=lambda s: s["stageId"]):
        rows.append({
            "stage": s["stageId"], "name": s["name"][:40],
            "tasks": s["numCompleteTasks"],
            "wall_ms": s.get("executorRunTime", 0),
            "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
            "gc_ms": s.get("jvmGcTime", 0),
            "sched_ms": s.get("schedulerDelay", 0),
            "first_ms": s["firstTaskLaunchedTime"],
            "submit": s["submissionTime"],
            "complete": s["completionTime"],
            "shuffle_write_mb": round(
                s.get("shuffleWriteBytes", 0) / 1e6, 1),
        })
        # per-stage task quantiles: tail vs median
        try:
            q = json.loads(urllib.request.urlopen(
                base + f"/stages/{s['stageId']}/0/taskSummary"
                       "?quantiles=0.0,0.5,0.95,1.0").read())
            rows[-1]["task_dur_q"] = q.get("duration")
            rows[-1]["task_gc_q"] = q.get("jvmGcTime")
        except Exception:
            pass
    print(json.dumps({"wall_s": round(wall, 2), "rows_out": n,
                      "cores": cores, "stages": rows}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
