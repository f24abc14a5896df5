#!/usr/bin/env python3
"""Local pre-verification harness (dev tool only, NOT part of the library).

Mirrors the driver's correctness gate: runs graft.Verify at a given SF,
then executes each oracle SQL in DuckDB over the same parquet tables and
compares (schema-insensitively): columns sorted by name, rows sorted,
values canonicalized. Exit nonzero on any mismatch.

Usage: python3 tools/check.py [sfDir] [outDir] [--skip-verify]
"""
import json, math, subprocess, sys
from decimal import Decimal
from pathlib import Path

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(f"Verify failed rc={r.returncode}")


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, Decimal):
        return f"{float(v):.9g}"
    if isinstance(v, pd.Timestamp):
        # NO tz normalization (r7 verdict: the old tz_convert/localize
        # masked tz-aware Spark output that the driver's strict
        # schema+hash gate fails) — a tz-aware value renders "+00:00"
        # here and mismatches the oracle's naive timestamp, exactly as
        # it would on the driver.
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(canon(x) for x in v)
    return v


def frame_key(df):
    df = df[sorted(df.columns)]
    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures, passed, rows_only = [], [], []
    import glob
    produced = {Path(p).name for p in glob.glob(str(OUT / "*")) if Path(p).is_dir()}
    for name in sorted(produced):
        try:
            got = pd.read_parquet(OUT / name)
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        if name not in oracle:
            rows_only.append((name, len(got)))
            if len(got) == 0:
                failures.append((name, "rows-only check: 0 rows"))
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        if sorted(map(str.lower, got.columns)) != sorted(map(str.lower, exp.columns)):
            failures.append((name, f"columns differ: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"))
            continue
        # Driver-grade schema sensitivity (r7 verdict): a tz-aware
        # datetime column in the Spark dump can never match DuckDB's
        # naive .df() timestamps under the driver's schema+hash gate,
        # so flag it as a schema failure here too.
        tz_cols = [c for c in got.columns
                   if isinstance(got[c].dtype, pd.DatetimeTZDtype)]
        if tz_cols:
            failures.append((name, f"tz-aware output columns {tz_cols} "
                             "(driver schema gate fails these; Parity NTZ cast missing?)"))
            continue
        got.columns = [c.lower() for c in got.columns]
        exp.columns = [c.lower() for c in exp.columns]
        kg, ke = frame_key(got), frame_key(exp)
        if len(kg) != len(ke):
            failures.append((name, f"row count: spark={len(kg)} oracle={len(ke)}"))
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(kg, ke)) if a != b]
        if diffs:
            i, a, b = diffs[0]
            failures.append((name, f"{len(diffs)} row diffs; first at {i}:\n  spark : {a}\n  oracle: {b}"))
        else:
            passed.append((name, len(kg)))
    for n, c in passed:
        print(f"PASS {n} ({c} rows)")
    for n, c in rows_only:
        print(f"ROWS-ONLY {n} ({c} rows)")
    for n, msg in failures:
        print(f"FAIL {n}: {msg}")
    print(f"\n{len(passed)} pass, {len(rows_only)} rows-only, {len(failures)} fail")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
