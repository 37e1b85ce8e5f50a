"""Shuffle-bytes evidence for extract_poly_stats shrink-then-attach
(round-4 VERDICT #8: the PIP 7x table's twin for J7).

Measures total shuffle WRITE bytes (Spark REST, summed over stages)
of the distributed extract path on a high-vertex fixture, against an
emulation of the round-3 plan in which every exploded cover row
carried its polygon's vertex arrays through the tile join.  Both
plans produce identical output (asserted); auto-broadcast is disabled
so the join exchanges model the 10^6-polygon / huge-raster scale
where neither side broadcasts.

Fixture: 100 polygons x 1500 vertices, radius 20-40 deg (so each
covers ~dozens of z6 tiles — cover fan-out is what the round-3 plan
multiplied vertices by), 300 pages burned at z6.

Usage: python BENCH/extract_bytes.py   (writes extract_bytes.json)
"""

from __future__ import annotations

import json
import math
import os
import sys
import urllib.request
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gdal2mbtiles_spark.operators.burn import burn_points
from gdal2mbtiles_spark.operators.spatial import (
    _masked_tile_stats, extract_poly_stats)
from gdal2mbtiles_spark.cells import polygon_cover_xy
from gdal2mbtiles_spark.session import get_spark
from gdal2mbtiles_spark.sources.pages import synth_pages, with_geo

Z = 6
N_POLYS = 100
N_VERTS = 1500
N_PAGES = 300


def big_polygons(spark):
    rng = np.random.default_rng(11)
    rows = []
    for p in range(N_POLYS):
        cx = float(rng.uniform(-150, 150))
        cy = float(rng.uniform(-50, 50))
        r = float(rng.uniform(20, 40))
        th = 2.0 * math.pi * np.arange(N_VERTS) / N_VERTS
        xs = np.clip(cx + r * np.cos(th), -179.9, 179.9)
        ys = np.clip(cy + r * np.sin(th), -80.0, 80.0)
        rows.append((p, [float(v) for v in xs], [float(v) for v in ys]))
    return spark.createDataFrame(
        rows, "poly_id int, xs array<double>, ys array<double>")


def shuffle_write_bytes(spark) -> int:
    base = (spark.sparkContext.uiWebUrl
            + f"/api/v1/applications/{spark.sparkContext.applicationId}")
    stages = json.loads(urllib.request.urlopen(
        base + "/stages?status=complete").read())
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def r3_plan(tiles, polys, z):
    """Round-3 shape: vertex arrays RIDE every exploded cover row
    through the tile join (what spatial.py:678-718 did before the
    round-4 vertex dedup)."""
    n = 1 << z

    def cover_kernel(batches: Iterator[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"poly_id": [], "x": [], "y": [], "xs": [], "ys": []}
            for pid, xs, ys in zip(pdf["poly_id"], pdf["xs"],
                                   pdf["ys"]):
                cx, cy = polygon_cover_xy(
                    np.asarray(xs, np.float64),
                    np.asarray(ys, np.float64), z)
                for a, b in zip(cx, cy):
                    out["poly_id"].append(int(pid))
                    out["x"].append(int(a))
                    out["y"].append(int(n - 1 - b))     # TMS flip
                    out["xs"].append(xs)
                    out["ys"].append(ys)
            yield pd.DataFrame(out)

    cover = polys.select("poly_id", "xs", "ys").mapInPandas(
        cover_kernel, schema="poly_id int, x bigint, y bigint, "
                             "xs array<double>, ys array<double>")
    cand = tiles.join(cover, ["x", "y"])

    def reduce_ride(batches: Iterator[pd.DataFrame]
                    ) -> Iterator[pd.DataFrame]:
        side = None
        for pdf in batches:
            pids, lits, asums = [], [], []
            for poly_id, x, y, buf, xs, ys in zip(
                    pdf["poly_id"], pdf["x"], pdf["y"], pdf["px"],
                    pdf["xs"], pdf["ys"]):
                raw = np.frombuffer(bytes(buf), np.uint8)
                if side is None:
                    side = int(math.isqrt(len(raw) // 4))
                alpha = raw.reshape(side, side, 4)[:, :, 3]
                st = _masked_tile_stats(
                    alpha, int(x), int(y), n,
                    np.asarray(xs, np.float64),
                    np.asarray(ys, np.float64))
                if st is None:
                    continue
                pids.append(int(poly_id))
                lits.append(st[0])
                asums.append(st[1])
            yield pd.DataFrame(
                {"poly_id": pd.Series(pids, dtype="int32"),
                 "lit_pixels": pd.Series(lits, dtype="int64"),
                 "alpha_sum": pd.Series(asums, dtype="int64")})

    partial = cand.mapInPandas(
        reduce_ride,
        schema="poly_id int, lit_pixels bigint, alpha_sum bigint")
    return (partial.groupBy("poly_id")
            .agg(F.sum("lit_pixels").alias("lit_pixels"),
                 F.sum("alpha_sum").alias("alpha_sum")))


def main():
    spark = get_spark(cores=4, app="extract-bytes",
                      shuffle_partitions=8, ui=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                   "-1")
    pages = with_geo(synth_pages(spark, N_PAGES))
    tiles = burn_points(pages, z=Z).persist()
    n_tiles = tiles.count()
    polys = big_polygons(spark)
    n_covers = polys.rdd.map(
        lambda r: len(polygon_cover_xy(
            np.asarray(r["xs"]), np.asarray(r["ys"]), Z)[0])).sum()

    b0 = shuffle_write_bytes(spark)
    got5 = {r["poly_id"]: (r["lit_pixels"], r["alpha_sum"])
            for r in extract_poly_stats(
                tiles, polys, Z, broadcast_polys=False).collect()}
    b1 = shuffle_write_bytes(spark)
    got3 = {r["poly_id"]: (r["lit_pixels"], r["alpha_sum"])
            for r in r3_plan(tiles, polys, Z).collect()}
    b2 = shuffle_write_bytes(spark)

    assert got3 == got5 and got5, (len(got3), len(got5))
    out = {
        "fixture": {"polys": N_POLYS, "verts_per_poly": N_VERTS,
                    "cover_rows": int(n_covers),
                    "lit_tiles": int(n_tiles), "z": Z,
                    "result_rows": len(got5)},
        "r4_plan_shuffle_bytes": b1 - b0,
        "r3_plan_shuffle_bytes": b2 - b1,
        "ratio": round((b2 - b1) / max(1, b1 - b0), 2),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__),
                           "extract_bytes.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
