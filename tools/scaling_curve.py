#!/usr/bin/env python3
"""Fit per-query scaling exponents from three Bench runs (dev tool only).

Round-9 verdict item 3: turn SCALE.md's 100x-scale prose into a measured
curve. Feed it the bench.json files produced by SPARK_GRAFT_BENCH_ONLY
runs at increasing data scales (e.g. sf0.01, sf0.1, and the 10x fixture
from tools/scale_fixture.py); it prints a markdown table of warm
per-query times with the fitted log-log slope over the largest decade
(the exponent alpha in t ~ rows^alpha, from the robust warm statistic).

Times quoted are the cross-pass robust stat ("queries" in bench.json);
artifact builds are amortized out of warm passes by design, so the
exponent reflects steady-state per-query work. The first row count is
read from each run's own "sf" directory (documents+events+embeddings+
lineitem rows — the tables the scaled queries read).

Usage: python3 tools/scaling_curve.py a.json b.json c.json
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ("documents", "events", "embeddings", "lineitem")

runs = []
for arg in sys.argv[1:]:
    b = json.loads(Path(arg).read_text())
    d = b["sf"]
    rows = sum(
        duckdb.sql(f"SELECT count(*) FROM '{d}/{t}.parquet'").fetchone()[0]
        for t in TABLES)
    runs.append((d, rows, b["queries"]))
runs.sort(key=lambda r: r[1])

names = sorted(set().union(*(r[2].keys() for r in runs)))
hdr = "| query | " + " | ".join(
    f"{Path(d).name} ({rows/1e6:.2f}M rows)" for d, rows, _ in runs)
print(hdr + " | alpha (last decade) |")
print("|---" * (len(runs) + 2) + "|")
for n in names:
    cells, pts = [], []
    for _, rows, q in runs:
        t = q.get(n)
        cells.append(f"{t:.2f} s" if t is not None else "—")
        if t is not None and t > 0:
            pts.append((rows, t))
    if len(pts) >= 2:
        (r1, t1), (r2, t2) = pts[-2], pts[-1]
        alpha = math.log(t2 / t1) / math.log(r2 / r1)
        a = f"{alpha:.2f}"
    else:
        a = "—"
    print(f"| {n} | " + " | ".join(cells) + f" | {a} |")
