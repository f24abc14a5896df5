#!/usr/bin/env python3
"""Regenerate README.md's bench paragraph from bench.json (dev tool only).

Round-7 verdict item 4: the README carried hand-written perf claims
("slowest ~5.5 s", "all strict-identical") that a fresh bench/driver run
contradicted. This tool makes every numeric claim mechanical: it reads
the committed bench.json and rewrites the block between
BENCH_STATS_BEGIN/END markers. Run it whenever bench.json is refreshed;
a README that disagrees with bench.json is then a one-command fix, and
any hand edit inside the markers is overwritten.

Round-8 verdict item 4: numbers are now PROVENANCE-LABELED (builder-host
vs driver-host). The builder numbers come from the committed bench.json;
the driver-host totals are read from the newest BENCH_r*.json tail so the
README never quotes a builder number a driver run silently contradicts.
Round-8 verdict item 3: the per-query profile quotes the MEDIAN across
the warm passes (which run in different seeded registry orders since r9),
so one order-dependent outlier cannot define a query's quoted time.

Usage: python3 tools/readme_bench.py [bench.json] [README.md]
"""
import json, re, statistics, sys
from pathlib import Path

BENCH = Path(sys.argv[1] if len(sys.argv) > 1 else "bench.json")
README = Path(sys.argv[2] if len(sys.argv) > 2 else "README.md")

b = json.loads(BENCH.read_text())

# Per-query warm statistic. The r10+ Bench writes its own cross-pass
# robust stat into "queries" (min of 2 passes, median at >=3 — the
# "warm_stat" field names it); quote exactly that so the README and the
# bench headline can never disagree. Older bench.json files carry the
# last pass alone in "queries" — recompute the median across
# warm_passes for those.
stat_name = b.get("warm_stat")
if stat_name:
    med_q = dict(b["queries"])
    stat_label = {"min_warm": "min", "median_warm": "median"}.get(
        stat_name, stat_name)
else:
    passes = [p["times"] for p in b.get("warm_passes", []) if p.get("times")]
    if not passes:
        passes = [b["queries"]]
    med_q = {k: statistics.median([p[k] for p in passes if k in p])
             for k in b["queries"]}
    stat_label = "median"
times = sorted(med_q.values())
n = len(times)
slowest = sorted(med_q.items(), key=lambda kv: -kv[1])[:3]
under2 = sum(1 for t in times if t < 2.0)
med = times[n // 2]
orders = len([p for p in b.get("warm_passes", []) if p.get("times")]) or 1

# Driver-host totals from the newest BENCH_r*.json (the round driver's
# own run of this same Bench main on its host). "Newest" is by the
# NUMERIC round in the name (lexicographic glob order puts r100 before
# r99), and the load sits inside the guard so one malformed BENCH file
# degrades to "no driver note" instead of crashing (r9 advice).
driver_note = ""
# Filter to names that actually carry a round number BEFORE sorting: a
# stray digit-less BENCH_r*.json would crash the sort key outside the
# try/except below, contradicting the degrade-to-no-note goal.
rounds = sorted((p for p in Path(".").glob("BENCH_r*.json")
                 if re.search(r"BENCH_r(\d+)", p.stem)),
                key=lambda p: int(re.search(r"BENCH_r(\d+)", p.stem).group(1)))
if rounds:
    latest = rounds[-1]
    try:
        tail = json.loads(latest.read_text()).get("tail", "")
        m = re.search(r'BENCH_SUMMARY ({.*?})', tail)
        if m:
            d = json.loads(m.group(1))
            driver_note = (
                f" Driver-host ({latest.name}, {d['n_queries']} queries): "
                f"warm {d['total']:.1f} s, cold {d['cold_total']:.1f} s.")
    except (json.JSONDecodeError, KeyError, AttributeError, TypeError):
        pass

lines = [
    f"Latest full bench (`bench.json`, **builder-host**, sf `{b['sf']}`, "
    f"local[32], {b['n_queries']} queries): warm total {b['total']:.1f} s, "
    f"cold total {b['cold_total']:.1f} s (session caches cleared before "
    f"every query); failed_warm={b['failed_warm']}, "
    f"failed_cold={b['failed_cold']}; first-pass session-artifact builds "
    f"{b['first_pass_artifact_build_s']:.1f} s.{driver_note}",
    f"Warm per-query profile (builder-host {stat_label} across {orders} pass "
    f"order{'s' if orders != 1 else ''}): median {med:.2f} s, {under2}/{n} "
    f"queries under 2 s; slowest three: "
    + ", ".join(f"{k} {v:.1f} s" for k, v in slowest) + ".",
    "Totals vary ~±10–20% run-to-run with page-cache state and ~1.3–1.5×",
    "between hosts; the full per-query map is the committed `bench.json`.",
]
block = "\n".join(lines)

text = README.read_text()
new, cnt = re.subn(
    r"(<!-- BENCH_STATS_BEGIN[^>]*-->).*?(<!-- BENCH_STATS_END -->)",
    lambda m: m.group(1) + "\n" + block + "\n" + m.group(2),
    text, flags=re.S)
if cnt != 1:
    sys.exit("BENCH_STATS markers not found (or found twice) in README.md")
README.write_text(new)
print(block)
