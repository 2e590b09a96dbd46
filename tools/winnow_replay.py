#!/usr/bin/env python3
"""Independent reference replay of Dedup.substringDupPairsWinnowed
(md5-hex rightmost-min winnowing, DF-capped pair counts) — a second
oracle engine for scales where the DuckDB list-op formulation is
CPU-bound (sf1 replica: 38 s here vs 80+ CPU-min in DuckDB 1.0).

Usage: python3 tools/winnow_replay.py <docs.parquet> <engine_out_dir> [k w maxDf] [--incr]
With --incr, replays the INCREMENTAL variant instead (the sf1 DuckDB
formulation exceeds a 1800 s budget): new docs (doc_id % 5 == 0) probe
the old corpus's winnowed windows, windows kept only when their OLD
document frequency is <= maxDf, output (new_id, old_id, n_shared).
Exits non-zero on any pair/count difference.
"""
import sys, hashlib, collections
import pyarrow.parquet as pq
import duckdb

docs, out = sys.argv[1], sys.argv[2]
k = int(sys.argv[3]) if len(sys.argv) > 3 else 24
w = int(sys.argv[4]) if len(sys.argv) > 4 else 8
maxdf = int(sys.argv[5]) if len(sys.argv) > 5 else 50
incr = "--incr" in sys.argv

t = pq.read_table(docs)
wins = collections.defaultdict(set)
for did, tx in zip(t.column('doc_id').to_pylist(), t.column('text').to_pylist()):
    n = len(tx)
    if n < k + w - 1:
        continue
    grams = [tx[i:i + k] for i in range(n - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    sel = set()
    for p in range(len(hs) - w + 1):
        window = hs[p:p + w]
        mn = min(window)
        sel.add(p + max(i for i, h in enumerate(window) if h == mn))
    for s in {grams[i] for i in sel}:
        wins[s].add(did)

pairs = collections.Counter()
if incr:
    for win, ds in wins.items():
        old = sorted(d for d in ds if d % 5 != 0)
        new = sorted(d for d in ds if d % 5 == 0)
        if not old or not new or (maxdf > 0 and len(old) > maxdf):
            continue
        for b in new:
            for a in old:
                pairs[(b, a)] += 1
    cols = "new_id, old_id"
else:
    for win, ds in wins.items():
        ds = sorted(ds)
        if len(ds) < 2 or (maxdf > 0 and len(ds) > maxdf):
            continue
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairs[(ds[i], ds[j])] += 1
    cols = "id_a, id_b"

got = {(a, b): n for a, b, n in duckdb.connect().execute(
    f"SELECT {cols}, n_shared FROM read_parquet('{out}/*.parquet')").fetchall()}
exp = dict(pairs)
if got == exp:
    print(f"PASS {len(exp)} pairs identical")
else:
    eo, po = set(got) - set(exp), set(exp) - set(got)
    mism = [(p, got[p], exp[p]) for p in set(got) & set(exp) if got[p] != exp[p]]
    sys.exit(f"FAIL engine-only={len(eo)} replay-only={len(po)} count-mismatch={len(mism)} "
             f"samples {list(eo)[:3]} {list(po)[:3]} {mism[:3]}")
