"""Single-box aggregate memory-bandwidth saturation probe.

Motivation (round 5): the z12 pyramid's fitted "serial floor" S is
not driver time (PLANS.md §9) — the residual component lives in the
numpy/zlib pixel kernels, whose cost is memory traffic through ONE
box's memory controllers shared by every local executor thread.  The
north_rule's two-cluster-size criterion is evidenced in this sandbox
with local-cluster legs on one box, so the aggregate-bandwidth curve
below quantifies exactly how much the wide legs are substrate-capped:
on a real N-node cluster each node brings its own memory controllers,
so per-4-core-executor bandwidth stays at the P=4 point of this curve
instead of the P=32 point.

Method: P worker processes (multiprocessing, no GIL sharing) each
repeatedly copy a 256 MB numpy buffer (read+write = 2 bytes moved per
byte copied, the same traffic pattern as the tile paint/encode
kernels).  Aggregate GB/s = P * bytes_moved / wall.  Each point is
the median of 3 runs.

Usage: python BENCH/membw.py [procs ...]   (default 1 4 8 16 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import statistics
import sys
import time

import numpy as np

BUF_MB = 256
REPS = 8  # copies per timed run per worker


def _worker(q: mp.Queue) -> None:
    src = np.random.default_rng(7).integers(
        0, 255, size=BUF_MB * (1 << 20), dtype=np.uint8)
    dst = np.empty_like(src)
    # touch both buffers so page faults are off the clock
    dst[:] = src
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.copyto(dst, src)
        np.copyto(src, dst)
    dt = time.perf_counter() - t0
    # 2 copies/rep, each moving BUF read + BUF write
    moved = REPS * 2 * 2 * BUF_MB / 1024.0  # GB
    q.put(moved / dt)


def measure(procs: int) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates)


def main() -> None:
    points = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16, 32]
    out = {}
    for procs in points:
        samples = [measure(procs) for _ in range(3)]
        out[str(procs)] = {
            "agg_gb_s": round(statistics.median(samples), 1),
            "samples": [round(s, 1) for s in samples],
            "per_proc_gb_s": round(statistics.median(samples) / procs, 2),
        }
        print(json.dumps({"procs": procs, **out[str(procs)]}))
    with open("BENCH/membw.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
