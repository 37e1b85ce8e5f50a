"""Deterministic vector fixtures: polygons and query points
(FIXTURES.md §4) plus a minimal WKB codec.

Vertices are generated driver-side with Python's libm (md5-seeded
convex k-gons), then fed to BOTH engines verbatim — the engine via
createDataFrame, the DuckDB oracle via inlined literal doubles
(repr round-trips exactly) — so point-in-polygon classification can
never diverge through trig library ULPs.
"""

from __future__ import annotations

import hashlib
import math
import struct
from typing import List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..cells import DEFAULT_RES, cells_covering_polygon


def _h(seed: str) -> str:
    return hashlib.md5(seed.encode()).hexdigest()


def _unit(seed: str, lo: float, hi: float, off: int = 0) -> float:
    return (int(_h(seed)[off:off + 8], 16) / 2 ** 32) * (hi - lo) + lo


def make_polygons(n: int = 50) -> List[Tuple[int, List[float],
                                             List[float]]]:
    """n convex k-gons (k=3..12): (poly_id, xs, ys) with closed-ring
    convention NOT included (first vertex not repeated)."""
    out = []
    for p in range(n):
        k = 3 + p % 10
        cx = _unit(f"poly{p}", -180.0, 180.0, 0)
        cy = _unit(f"poly{p}", -60.0, 60.0, 8)
        r = 0.5 + (int(_h(f"poly{p}")[16:20], 16) % 450) / 100.0
        xs = [cx + r * math.cos(2.0 * math.pi * i / k) for i in range(k)]
        ys = [cy + r * math.sin(2.0 * math.pi * i / k) for i in range(k)]
        out.append((p, xs, ys))
    return out


def make_query_points(n: int = 200) -> List[Tuple[int, float, float, int]]:
    """(query_id, lon, lat, k) seeded points, k in {1,5,10}."""
    out = []
    for q in range(n):
        lon = _unit(f"query{q}", -180.0, 180.0, 0)
        lat = _unit(f"query{q}", -80.0, 80.0, 8)
        k = (1, 5, 10)[q % 3]
        out.append((q, lon, lat, k))
    return out


# --- WKB codec (OGC well-known binary, little-endian Polygon) ---------------

def polygon_wkb(xs: List[float], ys: List[float]) -> bytes:
    """Encode a single-ring polygon as WKB (type 3, LE), closing the
    ring per spec."""
    npts = len(xs) + 1
    buf = [struct.pack("<BII", 1, 3, 1), struct.pack("<I", npts)]
    for x, y in zip(xs, ys):
        buf.append(struct.pack("<dd", x, y))
    buf.append(struct.pack("<dd", xs[0], ys[0]))
    return b"".join(buf)


def parse_polygon_wkb(wkb: bytes) -> Tuple[np.ndarray, np.ndarray]:
    bo, typ, nrings = struct.unpack_from("<BII", wkb, 0)
    if bo != 1 or typ != 3:
        raise ValueError("only little-endian WKB Polygon supported")
    (npts,) = struct.unpack_from("<I", wkb, 9)
    arr = np.frombuffer(wkb, dtype="<f8", count=2 * npts, offset=13)
    pts = arr.reshape(npts, 2)
    return pts[:-1, 0].copy(), pts[:-1, 1].copy()  # drop closing vertex


def polygons_df(spark: SparkSession, n: int = 50,
                res: int = DEFAULT_RES) -> DataFrame:
    """Polygons relation (SURVEY.md §1.1): poly_id, wkb, xs, ys,
    cells (coarse cover at ``res`` — the J5 broadcast side; scanline
    cover of the polygon itself, not its bbox, so a diagonal sliver
    candidates O(rows) cells instead of O(rows^2))."""
    polys = make_polygons(n)
    # Arrow path (round 6): createDataFrame(list) plans a Python RDD
    # re-evaluated — one near-idle Python-worker wave — by EVERY
    # action over a join that carries this side (each timed pip/kNN
    # call, each kNN loop iteration).  A pandas frame with exact
    # dtypes ships one driver-built Arrow batch instead; doubles and
    # bytes round-trip bit-exactly, so the oracle-matched vertices
    # are unchanged.
    pdf = pd.DataFrame({
        "poly_id": np.array([p for p, _, _ in polys], dtype=np.int32),
        "wkb": [bytes(polygon_wkb(xs, ys)) for _, xs, ys in polys],
        "xs": [xs for _, xs, _ in polys],
        "ys": [ys for _, _, ys in polys],
        "cells": [[int(c) for c in
                   cells_covering_polygon(xs, ys, res=res)]
                  for _, xs, ys in polys]})
    return spark.createDataFrame(
        pdf, schema="poly_id int, wkb binary, xs array<double>, "
                    "ys array<double>, cells array<long>")


def query_points_df(spark: SparkSession, n: int = 200) -> DataFrame:
    pts = make_query_points(n)
    pdf = pd.DataFrame({
        "query_id": np.array([q for q, _, _, _ in pts], dtype=np.int32),
        "lon": np.array([lon for _, lon, _, _ in pts],
                        dtype=np.float64),
        "lat": np.array([lat for _, _, lat, _ in pts],
                        dtype=np.float64),
        "k": np.array([k for _, _, _, k in pts], dtype=np.int32)})
    return spark.createDataFrame(
        pdf, schema="query_id int, lon double, lat double, k int")


# --- SQL twins (literal-inlined, for the DuckDB oracle) ---------------------

def polygon_edges_sql(n: int = 50) -> str:
    """VALUES list of polygon edges (poly_id, x1, y1, x2, y2) with the
    exact driver-side doubles inlined."""
    rows = []
    for p, xs, ys in make_polygons(n):
        k = len(xs)
        for i in range(k):
            j = (i + 1) % k
            rows.append(f"({p}, {xs[i]!r}, {ys[i]!r}, "
                        f"{xs[j]!r}, {ys[j]!r})")
    return ("SELECT * FROM (VALUES " + ", ".join(rows)
            + ") AS e(poly_id, x1, y1, x2, y2)")


def query_points_sql(n: int = 200) -> str:
    rows = [f"({q}, {lon!r}, {lat!r}, {k})"
            for q, lon, lat, k in make_query_points(n)]
    return ("SELECT * FROM (VALUES " + ", ".join(rows)
            + ") AS q(query_id, lon, lat, k)")
