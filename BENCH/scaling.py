"""Scaling-efficiency evidence (north_rule target: eff >= 0.8
between N and 4N executors).

Primary methodology (round 3): EXECUTOR-ISOLATED legs.  The
north_rule specifies N vs 4N *executors*; `local-cluster[E, C, mem]`
spawns E real executor JVMs (separate heaps, separate GC, separate
python workers) on this box — the faithful sandbox stand-in for E
cluster nodes.  The legs run the identical bench.py job on the same
input with only the executor count changing:

    leg A:  1 executor  x 4 cores   (N)
    leg B:  4 executors x 4 cores   (4N)

    eff = throughput(4N) / (4 * throughput(N))

Sampling: the host is a multi-tenant VM with 10-15% co-tenant CPU
steal under load, so both legs run the SAME number of repeats
(round-2 ADVICE: asymmetric best-of sampling biases the estimator)
and the headline efficiency is computed from MEDIANS, with every
sample published for dispersion.

Usage: python BENCH/scaling.py [repeats] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# cores per executor; override with SPARK_GRAFT_EXEC_CORES=2 to run
# a ratio whose BOTH legs stay inside the box's unsaturated
# memory-bandwidth region (BENCH/BASELINE.md substrate analysis):
# 1x2 vs 4x2 occupies ~4 vs ~16 busy procs
EXEC_CORES = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "4"))


def run_leg(n_execs: int, sf_dir: str, repeats: int,
            warmup: bool = False) -> dict:
    """``repeats`` pyramid-only samples of bench.py on a
    local-cluster with ``n_execs`` executors x EXEC_CORES cores.

    warmup=True runs ONE extra untimed sample first — applied to BOTH
    legs identically, so it is not asymmetric best-of sampling (the
    round-2 ADVICE trap): the first run of a leg is systematically
    cold (JVM spawn, JIT, page cache) by a margin that dwarfs the
    co-tenant noise band, and excluding exactly one warm-up per leg
    removes that bias from the medians without selecting on the
    measured values."""
    samples = []
    last = None
    for i in range(repeats + (1 if warmup else 0)):
        env = dict(os.environ,
                   SPARK_GRAFT_EXECUTORS=str(n_execs),
                   SPARK_GRAFT_CPUS=str(n_execs * EXEC_CORES),
                   SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_BENCH_ONLY="pyramid",
                   # cap each executor JVM at 2*cores visible
                   # processors: GC/JIT can't borrow idle host CPUs a
                   # real 4-core node would not have
                   SPARK_GRAFT_CAP_PROCS="1")
        t0 = time.time()
        with open("/proc/loadavg") as fh:
            load_before = fh.read().split()[0]
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True)
        line = out.stdout.strip().splitlines()[-1]
        last = json.loads(line)
        samples.append({
            "pyramid_s": last["queries"]["pyramid_full"],
            "tiles_per_s": last["value"],
            "wall_s": round(time.time() - t0, 1),
            "loadavg_before": load_before,
        })
    warm = None
    if warmup:
        # the warm-up sample is published but excluded from medians
        warm = samples.pop(0)
    med_s = statistics.median(s["pyramid_s"] for s in samples)
    return {
        "executors": n_execs,
        "cores_per_executor": EXEC_CORES,
        "warmup_sample_excluded": warm,
        "samples": samples,
        "median_pyramid_s": round(med_s, 2),
        "median_tiles_per_s": round(last["pyramid_tiles"] / med_s, 1),
        "best_tiles_per_s": round(
            max(s["tiles_per_s"] for s in samples), 1),
        "pyramid_tiles": last["pyramid_tiles"],
        "png_bytes": last["png_bytes"],
    }


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # optional second ratio (round-3 VERDICT #3): N and 4N with N =
    # base_execs; base > 1 writes raw JSON next to this script and
    # leaves the curated BASELINE.md alone
    base = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    warmup = bool(os.environ.get("SPARK_GRAFT_SCALING_WARMUP"))
    low = run_leg(base, sf_dir, repeats, warmup=warmup)
    high = run_leg(4 * base, sf_dir, repeats, warmup=warmup)
    if base != 1 or os.environ.get("SPARK_GRAFT_SCALING_JSON_ONLY"):
        eff = (high["median_tiles_per_s"]
               / (4.0 * low["median_tiles_per_s"]))
        out = {"base_executors": base, "repeats": repeats,
               "eff_median": round(eff, 3), "low": low, "high": high}
        rnd = os.environ.get("SPARK_GRAFT_SCALING_ROUND", "r5")
        path = os.path.join(REPO, "BENCH",
                            f"scaling_{rnd}_base{base}"
                            + (f"_c{EXEC_CORES}" if EXEC_CORES != 4
                               else "") + ".json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps({"eff_median": round(eff, 3),
                          "low_median_s": low["median_pyramid_s"],
                          "high_median_s": high["median_pyramid_s"],
                          "json": path}))
        return
    eff_med = high["median_tiles_per_s"] / (4.0
                                            * low["median_tiles_per_s"])
    eff_best = high["best_tiles_per_s"] / (4.0
                                           * low["best_tiles_per_s"])

    def fmt_samples(leg):
        return ", ".join(f"{s['pyramid_s']:.1f}"
                         for s in leg["samples"])

    md = [
        "# BENCH/BASELINE.md — scaling evidence (executor-isolated)",
        "",
        "Same job (`bench.py`, z10 pyramid: burn → phased sparse",
        "pyramid → MD5 dedup → PNG render, "
        f"{low['pyramid_tiles']:,} tiles), same input, same code",
        "state (one commit, both legs), only the executor count",
        "changes.  The north_rule specifies N vs 4N *executors*:",
        "`local-cluster[E, 4, mem]` spawns E separate executor JVMs",
        "(own heap, own GC, own Arrow/python workers) — the sandbox",
        "stand-in for E cluster nodes.  Per-executor memory is held",
        "constant (adding nodes adds memory, as on a real cluster),",
        "and each executor JVM is capped at 2×cores visible",
        "processors (`-XX:ActiveProcessorCount`) so a small leg",
        "cannot borrow idle host CPUs for GC/JIT.",
        "",
        "Sampling: equal repeats per leg (round-2 ADVICE — asymmetric",
        "best-of biases the estimator); efficiency is computed from",
        "MEDIANS, all samples published:",
        "",
        "| leg | pyramid secs (samples) | median s | median tiles/s |",
        "|---|---|---|---|",
        f"| 1 executor × {EXEC_CORES} cores | {fmt_samples(low)} | "
        f"{low['median_pyramid_s']} | {low['median_tiles_per_s']} |",
        f"| 4 executors × {EXEC_CORES} cores | {fmt_samples(high)} | "
        f"{high['median_pyramid_s']} | {high['median_tiles_per_s']} |",
        "",
        f"**Scaling efficiency (medians)** = "
        f"{high['median_tiles_per_s']} / (4 × "
        f"{low['median_tiles_per_s']}) = **{eff_med:.3f}** "
        f"({'PASS' if eff_med >= 0.8 else 'BELOW'} the ≥ 0.8 "
        "target).",
        f"Best-sample pair for reference: {eff_best:.3f}.",
        "",
        "Reference derived baseline: ~13 tiles/sec single machine",
        "(BASELINE.md).",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(low),
        json.dumps(high),
        "```",
        "",
        f"Reproduce: `python BENCH/scaling.py {repeats} {sf_dir}`",
    ]

    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as fh:
        fh.write("\n".join(md) + "\n")
    print(json.dumps({"eff_median": round(eff_med, 3),
                      "eff_best": round(eff_best, 3),
                      "low_median_s": low["median_pyramid_s"],
                      "high_median_s": high["median_pyramid_s"]}))


if __name__ == "__main__":
    main()
