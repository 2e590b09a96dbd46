#!/usr/bin/env python3
"""Independent exact replay of dp_dedup_stats for big-SF rehearsals.

The gate oracle verifies the MinHash-LSH cluster-size histogram
against EXACT bigram-Jaccard >= 0.5 closure via a brute-force
all-pairs SQL (a.doc_id < b.doc_id cross join) — O(N^2) pair
predicates, which is 1.25e11 at the sf1 replica and does not finish.
This tool computes the SAME exact semantics with the standard
prefix-filtered AllPairs algorithm (Bayardo et al., WWW'07), which is
exact for a Jaccard threshold (no recall loss, unlike LSH):

  - shingling/tokenization is done by DuckDB with the ORACLE'S OWN
    expressions (bit-identical token and bigram sets);
  - size filter: min*2 >= max; overlap bound: |A∩B| >= ceil(|A|/2)
    (J >= 1/2 with the size filter implies it);
  - prefix filter: a qualifying pair must collide inside the first
    |A| - ceil(|A|/2) + 1 lowest-document-frequency shingles of A;
  - candidates verified by exact set intersection, union-find
    closure, cluster-size histogram.

No code shared with the engine (Spark MinHash bands + verify) — this
is a different exact algorithm. Validate at a SF whose brute oracle
has already proven the engine row before trusting it at scale.

Usage: python3 tools/dedup_stats_replay.py <sfDir> <verifyOutDir>
"""
import sys
import glob
from collections import defaultdict
import duckdb
import numpy as np
import pyarrow.parquet as pq

SF, OUT = sys.argv[1], sys.argv[2]

con = duckdb.connect()
rows = con.execute(f"""
  WITH t AS (SELECT doc_id,
        list_filter(string_split_regex(lower(text),
          '[^a-z0-9_*\\p{{L}}\\p{{N}}]+'), x -> x <> '') AS toks
        FROM read_parquet('{SF}/documents.parquet'))
  SELECT doc_id, list_distinct(list_filter(list_transform(
           range(1, greatest(len(toks), 2)),
           i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT)+1]),
           x -> x IS NOT NULL)) AS sh
  FROM t ORDER BY doc_id
""").fetchall()

doc_ids = [r[0] for r in rows]
shingle_id = {}
docs = []
for _, sh in rows:
    s = []
    for g in sh:
        i = shingle_id.setdefault(g, len(shingle_id))
        s.append(i)
    docs.append(np.array(sorted(set(s)), np.int64))
n = len(docs)
print(f"{n} docs, {len(shingle_id)} shingles")

# document frequency, then order each doc's shingles by (df, id) asc
df = np.zeros(len(shingle_id), np.int64)
for s in docs:
    df[s] += 1
order_key = df * (len(shingle_id) + 1) + np.arange(len(shingle_id))

postings = defaultdict(list)  # shingle -> docs holding it in PREFIX
sets = []
for d, s in enumerate(docs):
    sets.append(frozenset(s.tolist()))
    if len(s) == 0:
        continue
    ordered = s[np.argsort(order_key[s], kind="stable")]
    plen = len(s) - (len(s) + 1) // 2 + 1  # |A| - ceil(|A|/2) + 1
    for g in ordered[:plen]:
        postings[int(g)].append(d)

# candidates: prefix collisions + size filter (vectorized; packed
# int64 pair keys deduped in chunks to bound memory)
sizes_arr = np.array([len(s) for s in sets], np.int64)
chunks, pending, deduped = [], 0, []
for lst in postings.values():
    if len(lst) < 2:
        continue
    L = np.array(lst, np.int64)
    i, j = np.triu_indices(len(L), 1)
    a, b = L[i], L[j]
    la, lb = sizes_arr[a], sizes_arr[b]
    ok = np.minimum(la, lb) * 2 >= np.maximum(la, lb)
    if ok.any():
        chunks.append(a[ok] * n + b[ok])  # postings sorted => a < b
        pending += int(ok.sum())
    if pending > 10_000_000:
        # dedupe each batch as it fills, and periodically merge the
        # deduped runs LSM-style — the first sf1 run kept every raw
        # 50M-key chunk alive and peaked at 88 GB RSS
        deduped.append(np.unique(np.concatenate(chunks)))
        chunks, pending = [], 0
        if len(deduped) > 16:
            deduped = [np.unique(np.concatenate(deduped))]
cand_keys = np.unique(np.concatenate(deduped + chunks)) if (deduped or chunks) \
    else np.empty(0, np.int64)
cand = [(int(k // n), int(k % n)) for k in cand_keys]
print(f"{len(cand)} candidate pairs")

# exact verification: J >= 0.5  <=>  2*I >= |A u B| = la + lb - I
parent = list(range(n))
def find(x):
    while parent[x] != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x
edges = 0
for a, b in cand:
    inter = len(sets[a] & sets[b])
    if inter * 3 >= len(sets[a]) + len(sets[b]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
        edges += 1
print(f"{edges} verified edges")

sizes = defaultdict(int)
for d in range(n):
    sizes[find(d)] += 1
hist = defaultdict(int)
for s in sizes.values():
    hist[s] += 1
expected = sorted((int(cs), int(nc), int(cs * nc)) for cs, nc in hist.items())

files = glob.glob(f"{OUT}/dp_dedup_stats/*.parquet")
g = pq.ParquetDataset(files).read().to_pandas().sort_values("cluster_size")
got = [(int(r.cluster_size), int(r.n_clusters), int(r.n_docs))
       for r in g.itertuples()]

if got == expected:
    print(f"  PASS dp_dedup_stats ({len(got)} rows, exact)")
    sys.exit(0)
print(f"  FAIL dp_dedup_stats:\n    got {got[:8]}...\n    exp {expected[:8]}...")
sys.exit(1)
