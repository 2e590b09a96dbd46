#!/usr/bin/env python3
"""Compare a SUBSET of gate queries against their DuckDB oracles —
for spot-checking new queries at a big SF without re-running the whole
(brute-force-oracle-dominated) sweep.

Usage: python3 tools/compare_subset.py <sfDir> <verifyOutDir> q1 q2 ...
"""
import json, os, sys
import duckdb
import pandas as pd

SF, OUT = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = []
for name in names:
    got = con.execute(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
    exp = con.execute(oracle[name]).fetchdf()
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        fails.append((name, f"schema {gcols} vs {ecols}")); continue
    got, exp = got[gcols].reset_index(drop=True), exp[ecols].reset_index(drop=True)
    if len(got) != len(exp):
        fails.append((name, f"rows {len(got)} vs {len(exp)}")); continue
    ok = True
    for c in gcols:
        for a, b in zip(got[c], exp[c]):
            if not ((pd.isna(a) and pd.isna(b)) or a == b):
                fails.append((name, f"col {c}: {a} != {b}")); ok = False; break
        if not ok: break
    if ok:
        print(f"  PASS {name} ({len(got)} rows)")
for n, why in fails:
    print(f"  FAIL {n}: {why}")
sys.exit(1 if fails else 0)
