#!/usr/bin/env python3
"""Deterministic N-x self-scale of the test fixture (dev tool only).

Round-9 verdict item 3: SCALE.md argued the 100-TB plan shapes but no
measured scaling curve existed above sf0.1. This tool builds a ~Nx
fixture from sf0.1 so Bench can run the expensive queries at three
data points (sf0.01 / sf0.1 / ~Nx sf0.1) and fit per-query scaling
exponents. The scale-up is STRUCTURE-PRESERVING, not naive row
duplication:

- documents: copy k prefixes every token with "k<k>" — each copy is an
  independent vocabulary domain with identical internal statistics, so
  near-dup pair density, posting-list shapes, and n-gram structure all
  scale linearly (naive copies would make every doc a 9-way exact
  duplicate and quadratically explode the pair queries).
- events: copy k shifts ts by k*(span+1h) and user/event ids into fresh
  ranges — 10x MORE HISTORY at the same arrival density (the realistic
  stream scale-up; shifting only ids would multiply per-hour concurrency
  and quadratically inflate interval-overlap output by construction).
- embeddings: fresh vec_id range + a tiny deterministic per-copy offset
  (keeps distance structure, avoids degenerate zero-distance ties).
- lineitem: fresh l_orderkey range per copy (same part/supp domains).
- dimension tables are copied verbatim (broadcast-scale by design).

Usage: python3 tools/scale_fixture.py [src=/root/testdata/sf0.1] \
         [dst=/tmp/sfx10] [copies=10]
"""
import shutil, sys
from pathlib import Path

import duckdb

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10")
N = int(sys.argv[3] if len(sys.argv) > 3 else 10)

DST.mkdir(parents=True, exist_ok=True)
con = duckdb.connect()

def write(sql: str, name: str) -> None:
    con.execute(
        f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

docs = f"'{SRC}/documents.parquet'"
parts = []
for k in range(N):
    if k == 0:
        parts.append(f"SELECT * FROM {docs}")
    else:
        # n_chars must track the REWRITTEN text (r10 advice: copying it
        # verbatim left n_chars != length(text) for (N-1)/N of the
        # fixture, mildly distorting any query correlating n_chars with
        # text-derived statistics).
        parts.append(
            f"SELECT doc_id + {k} * (SELECT max(doc_id) + 1 FROM {docs}), "
            f"regexp_replace(text, '([^ ]+)', 'k{k}\\1', 'g') AS text, "
            f"lang, source, "
            f"CAST(length(regexp_replace(text, '([^ ]+)', 'k{k}\\1', 'g')) "
            f"AS BIGINT) AS n_chars FROM {docs}")
write(" UNION ALL ".join(parts), "documents")

ev = f"'{SRC}/events.parquet'"
span = ("(SELECT epoch_us(max(ts)) - epoch_us(min(ts)) + 3600000000 "
        f"FROM {ev})")
parts = []
for k in range(N):
    parts.append(
        f"SELECT event_id + {k} * (SELECT max(event_id) + 1 FROM {ev}) "
        f"AS event_id, "
        f"make_timestamp(epoch_us(ts) + {k} * {span}) AS ts, "
        f"user_id + {k} * (SELECT max(user_id) + 1 FROM {ev}) AS user_id, "
        f"event_type, value, props FROM {ev}")
write(" UNION ALL ".join(parts), "events")

emb = f"'{SRC}/embeddings.parquet'"
parts = []
for k in range(N):
    parts.append(
        f"SELECT vec_id + {k} * (SELECT max(vec_id) + 1 FROM {emb}) "
        f"AS vec_id, "
        f"list_transform(embedding, x -> CAST(x + {k} * 0.0005 AS FLOAT)) "
        f"AS embedding, label FROM {emb}")
write(" UNION ALL ".join(parts), "embeddings")

li = f"'{SRC}/lineitem.parquet'"
parts = []
for k in range(N):
    parts.append(
        f"SELECT l_orderkey + {k} * (SELECT max(l_orderkey) + 1 FROM {li}) "
        f"AS l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM {li}")
write(" UNION ALL ".join(parts), "lineitem")

for t in ("region", "nation", "customer", "supplier", "part", "orders"):
    shutil.copy(SRC / f"{t}.parquet", DST / f"{t}.parquet")
    print(f"{t}: copied verbatim")
