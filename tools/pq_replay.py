#!/usr/bin/env python3
"""Independent NumPy replay of the PQ ANN family for big-SF rehearsals.

The DuckDB formulations of the dp_ann_pq / dp_ann_ivfpq /
dp_ann_pq_rerank oracles are join-fan-out CPU-bound at 200k vectors
(60+ CPU-minutes and climbing — same class as the winnow oracle, for
which tools/winnow_replay.py set the precedent in round 8). This tool
re-derives the SAME deterministic semantics straight from the
definitions (no shared code with the engine or the SQL):

  - integer lattice: v = floor(x * 1e6 + 0.5) per coordinate
  - PQ: m=4 subspaces x 16 dims, 8 codes, seeds = 8 smallest ids in
    id order, ONE Lloyd round (assign -> floor-mean update with
    empty-cell fallback to seed), final assignment, per-query ADC
    lookup-sum, self-match excluded, rank by (adist, neighbor_id)
  - rerank: PQ shortlist of 40, exact integer L2 on the full vectors,
    re-rank by (dist, neighbor_id), top 10
  - IVF-PQ: coarse IVF (16 centroids = 16 smallest ids, 2 Lloyd
    rounds by dot-product distance c.c - 2 e.c with cell-asc ties,
    centroid update = integer-sum / (n * 1e6) in doubles), probes =
    top-4 cells per query, PQ ADC distance over probed candidates

and compares row-for-row against the engine's Verify parquet output.

Usage: python3 tools/pq_replay.py <sfDir> <verifyOutDir> [queries...]
"""
import sys
import glob
import numpy as np
import pyarrow.parquet as pq

SF, OUT = sys.argv[1], sys.argv[2]
names = sys.argv[3:] or ["dp_ann_pq", "dp_ann_pq_rerank", "dp_ann_ivfpq"]
QUERIES = [0, 1, 2, 3, 4]

t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
t = t.sort_values("vec_id").reset_index(drop=True)
ids = t["vec_id"].to_numpy(np.int64)
E = np.stack(t["embedding"].to_numpy()).astype(np.float64)  # (N, 64); the
# oracle CASTs to DOUBLE before the lattice multiply — float32 math
# lands on different lattice points
V = np.floor(E * 1e6 + 0.5).astype(np.int64)     # integer lattice
N, D = V.shape
M, SUB, CODES = 4, D // 4, 8
qrows = np.searchsorted(ids, QUERIES)
assert (ids[qrows] == QUERIES).all(), "query ids missing"


def pq_train_assign_lut():
    """Per subspace: (final assignment (N,), per-query LUT (nq, CODES))."""
    seeds = np.argsort(ids, kind="stable")[:CODES]  # ids sorted asc; first 8
    assigns, luts = [], []
    for s in range(M):
        sub = V[:, s * SUB:(s + 1) * SUB]            # (N, 16)
        c0 = sub[seeds].copy()                        # (8, 16)
        d1 = ((sub[:, None, :] - c0[None, :, :]) ** 2).sum(-1)  # (N, 8)
        a1 = d1.argmin(1)                             # ties -> lowest cell
        c1 = c0.copy()
        for cell in range(CODES):
            members = sub[a1 == cell]
            if len(members):
                # SQL floor(sum/count): exact integer floor division
                c1[cell] = members.sum(0, dtype=np.int64) // len(members)
        d2 = ((sub[:, None, :] - c1[None, :, :]) ** 2).sum(-1)
        assigns.append(d2.argmin(1))
        luts.append(((sub[qrows][:, None, :] - c1[None, :, :]) ** 2).sum(-1))
    return assigns, luts


def pq_adc():
    """ADC distance per (query, point): (nq, N) int64."""
    assigns, luts = pq_train_assign_lut()
    adist = np.zeros((len(QUERIES), N), np.int64)
    for s in range(M):
        adist += luts[s][:, assigns[s]]
    return adist


def topk(dist_row, nbr_ids, exclude, k):
    """rank by (dist, neighbor_id) ascending, excluding self."""
    keep = nbr_ids != exclude
    d, n = dist_row[keep], nbr_ids[keep]
    order = np.lexsort((n, d))[:k]
    return list(zip(n[order], d[order]))


def expected_pq(k=10):
    adist = pq_adc()
    rows = []
    for qi, q in enumerate(QUERIES):
        for rank, (n, d) in enumerate(topk(adist[qi], ids, q, k), 1):
            rows.append((q, int(n), rank, int(d)))
    return rows


def expected_pq_rerank(shortlist=40, k=10):
    adist = pq_adc()
    rows = []
    for qi, q in enumerate(QUERIES):
        short = [n for n, _ in topk(adist[qi], ids, q, shortlist)]
        srows = np.searchsorted(ids, short)
        exact = ((V[srows] - V[qrows[qi]][None, :]) ** 2).sum(-1)
        for rank, (n, d) in enumerate(
                topk(exact, np.array(short, np.int64), -1, k), 1):
            rows.append((q, int(n), rank, int(d)))
    return rows


def expected_ivfpq(ncentroids=16, probes=4, k=10):
    # coarse IVF in the oracle's own arithmetic: distance
    # c.c - 2 e.c on DOUBLE vectors, sequential-sum dot products
    cent = E[np.argsort(ids, kind="stable")[:ncentroids]].copy()
    for _ in range(2):  # two Lloyd rounds -> cent2
        d = (cent * cent).sum(1)[None, :] - 2.0 * (E @ cent.T)  # (N, 16)
        a = d.argmin(1)
        newc = cent.copy()
        for cell in range(ncentroids):
            members = V[a == cell]
            if len(members):
                newc[cell] = members.sum(0, dtype=np.int64) / (len(members) * 1e6)
        cent = newc
    d = (cent * cent).sum(1)[None, :] - 2.0 * (E @ cent.T)
    afinal = d.argmin(1)
    # probes: top-4 cells per query by the same distance
    adist = pq_adc()
    rows = []
    for qi, q in enumerate(QUERIES):
        dq = d[qrows[qi]]
        probe_cells = np.lexsort((np.arange(ncentroids), dq))[:probes]
        cand = np.isin(afinal, probe_cells) & (ids != q)
        cd, cn = adist[qi][cand], ids[cand]
        order = np.lexsort((cn, cd))[:k]
        for rank, j in enumerate(order, 1):
            rows.append((q, int(cn[j]), rank, int(cd[j])))
    return rows


def engine_rows(name):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    df = pq.ParquetDataset(files).read().to_pandas()
    df = df.sort_values(["query_id", "rank"]).reset_index(drop=True)
    dcol = "adist" if "adist" in df.columns else "dist"
    return [(int(r.query_id), int(r.neighbor_id), int(r.rank), int(getattr(r, dcol)))
            for r in df.itertuples()]


EXPECTED = {
    "dp_ann_pq": expected_pq,
    "dp_ann_pq_rerank": expected_pq_rerank,
    "dp_ann_ivfpq": expected_ivfpq,
}

fails = 0
for name in names:
    got = engine_rows(name)
    exp = EXPECTED[name]()
    if got == exp:
        print(f"  PASS {name} ({len(got)} rows, exact)")
    else:
        fails += 1
        diffs = [(g, e) for g, e in zip(got, exp) if g != e]
        print(f"  FAIL {name}: rows {len(got)} vs {len(exp)}; first diffs: {diffs[:3]}")
print(f"=== PASS {len(names) - fails} / FAIL {fails} ===")
sys.exit(1 if fails else 0)
