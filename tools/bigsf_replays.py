#!/usr/bin/env python3
"""Candidate-superset replays for the brute-pair oracles at big SF.

Several gate oracles verify the engine against a BRUTE-FORCE O(N^2)
pair join (exact bigram-Jaccard / containment / simhash hamming /
embedding dot) — the strongest possible check at gate SF, intractable
at the sf1 replica (1.25e11 pair predicates). This tool keeps the
oracle's OWN SQL as the arbiter and replaces only the quadratic join:

  1. Python computes an exact candidate-pair SUPERSET with the
     standard prefix-filter / pigeonhole / matmul-prescreen arguments
     (no false negatives BY CONSTRUCTION — see per-mode notes below);
  2. the superset is registered as a DuckDB table `cand`;
  3. the oracle SQL is rewritten so `FROM s a, s b` becomes a join
     THROUGH `cand`, with every original predicate re-applied — so
     ALL final arithmetic (intersections, unions, dots, hamming,
     recursive closure, splitmix splits) is still DuckDB evaluating
     the oracle's own expressions, on candidate pairs only.

Superset guarantees:
  - jaccard t: both-side prefix filter at length |x| - ceil(t*|x|) + 1
    under a global (df asc, id asc) canonical order — longer than the
    Bayardo et al. (WWW'07) indexing prefix |x| - ceil(2t/(1+t)*|x|)
    + 1, hence a superset of an exact scheme (r9 validated this
    machinery bit-exact at sf1 via tools/dedup_stats_replay.py);
  - containment c: a pair with |A∩B| >= c*|A| must place a common
    shingle inside A's first |A| - ceil(c*|A|) + 1 rarest shingles
    (at most |A| - ceil(c*|A|) elements of A are outside B);
  - simhash, hamming <= 3: 4 disjoint 16-bit bands; by pigeonhole a
    pair within 3 bits collides on at least one full band;
  - embedding dot >= t: float64 blocked matmul with an epsilon margin
    (1e-9 against a worst-case f64 64-term dot error of ~1e-14).

Every replay must be validated at a small SF whose brute oracle has
already proven the engine output (run this tool at sf0.01/sf0.1 and
expect PASS) before its sf1 verdict is trusted.

Usage: python3 tools/bigsf_replays.py <sfDir> <verifyOutDir> <name...>
Exit 0 iff every requested row PASSes.
"""
import json
import os
import sys
from collections import defaultdict

import duckdb
import numpy as np
import pandas as pd

SF, OUT = sys.argv[1], sys.argv[2]
NAMES = sys.argv[3:]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# mode jaccard: threshold (num, den) of the J >= num/den predicate
# mode containment: (num, den) of the |A∩B| >= num/den * |A| predicate
FAMILY = {
    # numpy_pairs: DuckDB's rewritten join stalls on THIS row's list
    # expressions at sf1 (>90 min on 250k candidate pairs whose total
    # |A|x|B| arithmetic is only 8.5e8 ops — a pathological plan, not
    # real work), so the pair columns (inter/union counts) are computed
    # exactly in NumPy instead — the same trust pattern as the
    # containment row (validated at sf0.01 against the DuckDB-proven
    # gate outputs before any sf1 verdict is trusted)
    "dp_dedup_minhash_lsh": dict(mode="jaccard", src="s", t=(1, 2),
                                 numpy_pairs=True, band_contract=True),
    # band_contract on the whole closure family: these rows' engine
    # pairs all come through the SAME banded-LSH front end as
    # dp_dedup_minhash_lsh (128 hashes, 32 bands), so their expected
    # frames must be built from the banded pair set too. The r11 sf1
    # sweep passed these rows on REPLICA LUCK: the 6 banding-missed
    # grazing pairs happened to be bridged by base docs — a replica
    # where such a pair is the ONLY bridge between two components
    # would (correctly) cluster differently in the engine than in a
    # brute-pair oracle. See tools/band_bridge_demo.py for the
    # synthetic demonstration.
    "dp_dedup_clusters":    dict(mode="jaccard", src="s", t=(1, 2),
                                 band_contract=True),
    "dp_dedup_soft":        dict(mode="jaccard", src="s", t=(1, 2),
                                 band_contract=True),
    "dp_dedup_stats":       dict(mode="jaccard", src="s", t=(1, 2),
                                 band_contract=True),
    "dp_split_leakage":     dict(mode="jaccard", src="s", t=(1, 2),
                                 band_contract=True),
    "dp_dedup_incremental": dict(mode="jaccard", src="s", t=(1, 2),
                                 aliases=("n", "o"), both_dirs=True,
                                 band_contract=True),
    # streaming near-dedup survivors: batch (% 5 = 0) minus the larger
    # side of every in-batch contract pair minus docs paired with any
    # indexed doc — derived in NumPy from the SAME band-contract
    # true-pair set the closure family verifies against (both engine
    # relations ride the 128/32 banded front end)
    "dp_stream_neardedup": dict(mode="jaccard", src="s", t=(1, 2),
                                band_contract=True,
                                stream_survivors=True),
    # numpy_pairs (no band contract — the engine op is the EXACT
    # length-blocked brute join): same DuckDB-stall workaround as
    # dp_dedup_minhash_lsh, same select shape
    "dp_dedup_ngram":       dict(mode="jaccard", src="s", t=(3, 10),
                                 nchars_window=25, numpy_pairs=True),
    "dp_curate":            dict(mode="jaccard", src="sh2", t=(1, 2)),
    # cap=(maxDfFrac, maxDfAbs): the gate query's posting cap — the
    # oracle (and so this replay) excludes pairs whose every shared
    # shingle is hot (df > min(maxDfAbs, floor(maxDfFrac*N)))
    "dp_dedup_containment": dict(mode="containment", src="nz", t=(9, 10),
                                 cap=(0.1, 500)),
    "dp_dedup_simhash":     dict(mode="simhash", src="s", maxham=3),
    # src="e": the cutover-aware oracles (SparkEntry.nearDupPairJoinSql)
    # alias the signature CTE; the exact-threshold prescreen stays a
    # strict superset of (dot >= thr AND shares-a-band), and the
    # rewritten SQL re-applies BOTH predicates on every candidate
    "dp_embed_neardup":     dict(mode="vec", src="e", thr=0.4,
                                 idcol="vec_id"),
    "dp_dedup_semantic":    dict(mode="vec", src="e", thr=0.4,
                                 idcol="vec_id", both_dirs=True),
}

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def sets_prefix(sql, src, a, b):
    """The oracle's WITH chain up to (excluding) the pair join, so the
    per-doc sets come from the oracle's own expressions."""
    import re
    m = re.search(r",\s*(pairs|drop_self) AS", sql)
    if m:
        return sql[:m.start()].rstrip()
    j = sql.find(f"FROM {src} {a}, {src} {b}")
    assert j > 0, f"pair join over {src} not found"
    return sql[:sql.rfind("SELECT", 0, j)].rstrip().rstrip(",")


def rewrite_join(sql, src, idcol, a, b):
    pat = f"FROM {src} {a}, {src} {b}"
    rep = (f"FROM {src} {a} JOIN cand ON {a}.{idcol} = cand.id_a "
           f"JOIN {src} {b} ON {b}.{idcol} = cand.id_b")
    assert pat in sql, pat
    return sql.replace(pat, rep)


def dedup_pairs(chunks, deduped, force=False, pending=0):
    if force or pending > 10_000_000:
        if chunks:
            deduped.append(np.unique(np.concatenate(chunks)))
        chunks.clear()
        if len(deduped) > 16 or (force and len(deduped) > 1):
            merged = np.unique(np.concatenate(deduped))
            deduped.clear()
            deduped.append(merged)
        return 0
    return pending


def jaccard_candidates(ids, sets, t_num, t_den, nchars=None, nchars_window=None):
    """Exact superset of unordered pairs with J >= t_num/t_den.
    `nchars`/`nchars_window`: when the oracle ALSO requires
    |n_chars_a - n_chars_b| <= window, apply it during generation (a
    predicate of the oracle, so pruning by it preserves exactness)."""
    n = len(sets)
    shingle_id = {}
    docs = []
    for sh in sets:
        s = sorted({shingle_id.setdefault(g, len(shingle_id)) for g in sh})
        docs.append(np.array(s, np.int64))
    df = np.zeros(len(shingle_id), np.int64)
    for s in docs:
        df[s] += 1
    order_key = df * (len(shingle_id) + 1) + np.arange(len(shingle_id))
    postings = defaultdict(list)
    for d, s in enumerate(docs):
        if len(s) == 0:
            continue
        ordered = s[np.argsort(order_key[s], kind="stable")]
        plen = len(s) - (len(s) * t_num + t_den - 1) // t_den + 1
        for g in ordered[: max(plen, 1)]:
            postings[int(g)].append(d)
    sizes = np.array([len(s) for s in docs], np.int64)
    chunks, deduped, pending = [], [], 0
    for lst in postings.values():
        if len(lst) < 2:
            continue
        L = np.array(lst, np.int64)

        def emit(pa, pb):
            nonlocal pending
            la, lb = sizes[pa], sizes[pb]
            # size filter implied by J >= t: t*max <= I <= min
            ok = np.minimum(la, lb) * t_den >= t_num * np.maximum(la, lb)
            if nchars is not None and nchars_window is not None:
                ok &= np.abs(nchars[pa] - nchars[pb]) <= nchars_window
            if ok.any():
                chunks.append(pa[ok] * n + pb[ok])
                pending += int(ok.sum())
            pending = dedup_pairs(chunks, deduped, pending=pending)

        # block long posting lists so one hot shingle never allocates
        # len^2 pair keys at once (per-block peak: step^2 = 16M keys)
        step = 4096
        for x0 in range(0, len(L), step):
            A = L[x0:x0 + step]
            i, j = np.triu_indices(len(A), 1)
            emit(A[i], A[j])
            for y0 in range(x0 + step, len(L), step):
                B = L[y0:y0 + step]
                emit(np.repeat(A, len(B)), np.tile(B, len(A)))
    dedup_pairs(chunks, deduped, force=True)
    keys = deduped[0] if deduped else np.empty(0, np.int64)
    return ids[keys // n], ids[keys % n]


def containment_candidates(ids, sets, c_num, c_den):
    """Exact superset of DIRECTED pairs with |A∩B| >= c*|A|, A != B."""
    n = len(sets)
    shingle_id = {}
    docs = []
    for sh in sets:
        s = sorted({shingle_id.setdefault(g, len(shingle_id)) for g in sh})
        docs.append(np.array(s, np.int64))
    df = np.zeros(len(shingle_id), np.int64)
    for s in docs:
        df[s] += 1
    order_key = df * (len(shingle_id) + 1) + np.arange(len(shingle_id))
    full_postings = defaultdict(list)
    for d, s in enumerate(docs):
        for g in s:
            full_postings[int(g)].append(d)
    out_a, out_b = [], []
    for d, s in enumerate(docs):
        if len(s) == 0:
            continue
        ordered = s[np.argsort(order_key[s], kind="stable")]
        plen = len(s) - (len(s) * c_num + c_den - 1) // c_den + 1
        cand = set()
        for g in ordered[: max(plen, 1)]:
            cand.update(full_postings[int(g)])
        cand.discard(d)
        if cand:
            cl = np.fromiter(cand, np.int64)
            out_a.append(np.full(len(cl), d, np.int64))
            out_b.append(cl)
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    return ids[a], ids[b]


def simhash_candidates(ids, sims):
    """Exact superset (pigeonhole) of pairs within hamming 3 of 64-bit
    sims split into 4 x 16-bit bands."""
    u = sims.astype(np.uint64)
    n = len(u)
    chunks, deduped, pending = [], [], 0
    for band in range(4):
        key = (u >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], n]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            L = np.sort(order[s:e])
            step = 4096  # same hot-bucket blocking as the jaccard path
            for x0 in range(0, len(L), step):
                A = L[x0:x0 + step]
                i, j = np.triu_indices(len(A), 1)
                chunks.append(A[i] * n + A[j])
                pending += len(i)
                pending = dedup_pairs(chunks, deduped, pending=pending)
                for y0 in range(x0 + step, len(L), step):
                    B = L[y0:y0 + step]
                    chunks.append(np.repeat(A, len(B)) * n + np.tile(B, len(A)))
                    pending += len(A) * len(B)
                    pending = dedup_pairs(chunks, deduped, pending=pending)
    dedup_pairs(chunks, deduped, force=True)
    keys = deduped[0] if deduped else np.empty(0, np.int64)
    return ids[keys // n], ids[keys % n]


def vec_candidates(ids, E, thr):
    """Superset of unordered pairs with dot >= thr: f64 blocked matmul,
    1e-9 margin over the worst-case 64-term f64 dot rounding."""
    n = E.shape[0]
    out_a, out_b = [], []
    block = max(1, int(2e9 / (8 * n)))
    for s in range(0, n, block):
        e = min(n, s + block)
        D = E[s:e] @ E.T
        ii, jj = np.nonzero(D >= thr - 1e-9)
        gi = ii + s
        keep = gi < jj  # a < b once, dedupes the symmetric blocks
        out_a.append(gi[keep])
        out_b.append(jj[keep])
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    return ids[a], ids[b]


def _bitmap_inter(docs, lens, flat, off, V, pa, pb, nothot=None):
    """Exact |A∩B| for index pair arrays (pa, pb), aligned to input
    order. Counts each pair once: the smaller set's elements are
    gathered and tested against a boolean bitmap of the larger set,
    grouped by the bitmap doc so temporaries stay allocator-recycled
    (first-touch page faults cost ~40 s/GB here). With `nothot`, also
    returns the count restricted to non-hot shingles."""
    Q = len(pa)
    small = lens[pa] <= lens[pb]
    gath = np.where(small, pa, pb)
    memb = np.where(small, pb, pa)
    del small
    order = np.argsort(memb, kind="stable")
    gath, memb = gath[order], memb[order]
    inter = np.empty(Q, np.int64)
    inter_nh = np.empty(Q, np.int64) if nothot is not None else None
    if Q:
        starts = np.flatnonzero(np.r_[True, memb[1:] != memb[:-1]])
        ends = np.r_[starts[1:], Q]
    else:
        starts = ends = np.empty(0, np.int64)
    mark = np.zeros(V, bool)
    AR = np.arange(2, dtype=np.int64)
    for s, e in zip(starts, ends):
        dm = docs[memb[s]]
        mark[dm] = True
        g = gath[s:e]
        reps = lens[g]
        tot = int(reps.sum())
        if len(AR) < tot:
            AR = np.arange(max(tot, 2 * len(AR)), dtype=np.int64)
        csum = np.cumsum(reps) - reps
        gidx = np.repeat(off[g] - csum, reps) + AR[:tot]
        sh = flat[gidx]
        member = mark[sh]
        prow = np.repeat(AR[:e - s], reps)
        inter[s:e] = np.bincount(prow, weights=member,
                                 minlength=e - s).astype(np.int64)
        if nothot is not None:
            inter_nh[s:e] = np.bincount(prow, weights=member & nothot[sh],
                                        minlength=e - s).astype(np.int64)
        mark[dm] = False
    # scatter back to input order
    out = np.empty(Q, np.int64)
    out[order] = inter
    if nothot is None:
        return out
    out_nh = np.empty(Q, np.int64)
    out_nh[order] = inter_nh
    return out, out_nh


def containment_expected(ids, docs, ca, cb, c_num, c_den,
                         cap_frac=1.0, cap_abs=0):
    """Exact expected rows (id_a, id_b, inter_cnt, n_a) of the directed
    containment oracle `|A∩B| * c_den >= c_num * |A|`, computed in
    NumPy from an exact directed candidate superset (ca -> cb, doc
    ids). |A∩B| is symmetric, so candidates are deduped to unordered
    pairs, each intersection is counted ONCE (the smaller set's
    elements tested against a bitmap of the larger set), and both
    directions are then tested against the exact predicate — a
    direction absent from the superset cannot pass it (superset
    exactness), so emitting any passing direction is sound.

    cap_frac/cap_abs mirror the gate query's posting cap: the oracle's
    contract excludes pairs whose every shared shingle is hot
    (document frequency > min(cap_abs, floor(cap_frac*N))), so a
    second per-pair count restricted to non-hot shingles gates the
    emission. cap_frac=1.0, cap_abs=0 disables (no hot set).

    Performance shape: first-touch page faults are very expensive in
    this environment (measured ~40 s/GB on fresh mmaps), so the hot
    loop works in per-membership-doc groups whose temporaries are
    small enough for the allocator to recycle, and the only
    full-length arrays are the pair columns themselves."""
    lens = np.array([len(d) for d in docs], np.int64)
    n = len(ids)
    flat = np.concatenate(docs) if docs else np.empty(0, np.int64)
    off = np.zeros(n + 1, np.int64)
    off[1:] = np.cumsum(lens)
    V = int(flat.max()) + 1 if len(flat) else 1
    # hot set per the gate query's cap (df counts docs: per-doc
    # shingle lists are distinct)
    nothot = np.ones(V, bool)
    if cap_abs or cap_frac < 1.0:
        df = np.zeros(V, np.int64)
        for d in docs:
            df[d] += 1
        cap = max(1, int(cap_frac * n))
        if cap_abs:
            cap = min(cap, cap_abs)
        nothot = df <= cap
    # map doc ids -> indexes, apply the necessary size condition
    # (inter <= min(|A|,|B|) so c*|A| <= |B|), build unordered keys
    P = len(ca)
    keys = np.empty(P, np.int64)
    w = 0
    CH = 4_000_000
    for p0 in range(0, P, CH):
        ia = np.searchsorted(ids, ca[p0:p0 + CH])
        ib = np.searchsorted(ids, cb[p0:p0 + CH])
        keep = lens[ib] * c_den >= c_num * lens[ia]
        ia, ib = ia[keep], ib[keep]
        k = np.minimum(ia, ib) * n + np.maximum(ia, ib)
        keys[w:w + len(k)] = k
        w += len(k)
    ukey = np.unique(keys[:w])
    del keys
    plo = ukey // n
    phi = ukey % n
    del ukey
    inter, inter_nh = _bitmap_inter(docs, lens, flat, off, V, plo, phi,
                                    nothot=nothot)
    out_a, out_b, out_i = [], [], []
    for x, y in ((plo, phi), (phi, plo)):
        okd = (inter * c_den >= c_num * lens[x]) & (inter_nh > 0)
        out_a.append(x[okd])
        out_b.append(y[okd])
        out_i.append(inter[okd])
    A = np.concatenate(out_a)
    B = np.concatenate(out_b)
    I = np.concatenate(out_i)
    exp = pd.DataFrame({"id_a": ids[A], "id_b": ids[B],
                        "inter_cnt": I, "n_a": lens[A]})
    return exp.sort_values(["id_a", "id_b"],
                           kind="mergesort").reset_index(drop=True)


# --- engine-arithmetic replay of the MinHash banding contract --------
# dp_dedup_minhash_lsh's documented contract is banded-LSH recall
# (1-(1-J^r)^b), not brute exactness: at sf1 the closure contains
# threshold-grazing pairs (J=0.6 -> per-pair miss p ~ 1.2%) the gate
# SFs never produced, so the brute-equality expectation over-asserts —
# the same scale-threshold contract class as the r10 quantile/posting/
# embed-cutover finds. The expected pair set therefore applies the
# SAME band-collision predicate the engine documents: XXH64(seed 42)
# shingle hashes (pure-python implementation of the public spec,
# validated bit-for-bit against Spark's xxhash64), the splitmix64-
# derived affine permutations mod P = 2^31-1 (MinHashCoefficients),
# and the 31x band fold (MinHashBandKeysExpr). The recall floor above
# still judges the result against the UNfiltered brute closure via the
# independence model, so this replay cannot silently follow a recall
# collapse.
_M64 = (1 << 64) - 1
_XP1, _XP2, _XP3, _XP4, _XP5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                                0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                                0x27D4EB2F165667C5)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data, seed=42):
    """XXH64 over bytes — matches Spark's xxhash64 (returns unsigned)."""
    n = len(data); i = 0
    if n >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64; v2 = (seed + _XP2) & _M64
        v3 = seed & _M64; v4 = (seed - _XP1) & _M64
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * _XP2) & _M64, 31) * _XP1) & _M64; i += 8
            v2 = (_rotl((v2 + int.from_bytes(data[i:i + 8], "little") * _XP2) & _M64, 31) * _XP1) & _M64; i += 8
            v3 = (_rotl((v3 + int.from_bytes(data[i:i + 8], "little") * _XP2) & _M64, 31) * _XP1) & _M64; i += 8
            v4 = (_rotl((v4 + int.from_bytes(data[i:i + 8], "little") * _XP2) & _M64, 31) * _XP1) & _M64; i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = (h ^ (_rotl((v * _XP2) & _M64, 31) * _XP1) & _M64) & _M64
            h = (h * _XP1 + _XP4) & _M64
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h = (h ^ (_rotl((int.from_bytes(data[i:i + 8], "little") * _XP2) & _M64, 31) * _XP1) & _M64) & _M64
        h = (_rotl(h, 27) * _XP1 + _XP4) & _M64; i += 8
    if i + 4 <= n:
        h = (h ^ (int.from_bytes(data[i:i + 4], "little") * _XP1) & _M64) & _M64
        h = (_rotl(h, 23) * _XP2 + _XP3) & _M64; i += 4
    while i < n:
        h = (h ^ (data[i] * _XP5) & _M64) & _M64
        h = (_rotl(h, 11) * _XP1) & _M64; i += 1
    h = (h ^ (h >> 33)) & _M64; h = (h * _XP2) & _M64
    h = (h ^ (h >> 29)) & _M64; h = (h * _XP3) & _M64
    return (h ^ (h >> 32)) & _M64


_MHP = 2147483647  # Mersenne prime, MinHashCoefficients.P


def _splitmix64(z):
    z = (z + 0x9E3779B97F4A7C15) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    z = z ^ (z >> 31)
    return z - (1 << 64) if z >= (1 << 63) else z  # signed, like Java


def _mh_coeffs(num_hashes):
    a = np.empty(num_hashes, np.int64)
    b = np.empty(num_hashes, np.int64)
    for i in range(num_hashes):
        a[i] = _splitmix64(2 * i) % (_MHP - 1) + 1   # python %: mathematical mod
        b[i] = _splitmix64(2 * i + 1) % _MHP
    return a, b


def minhash_band_keys(sets, num_hashes=128, bands=32):
    """Per-doc band keys replaying the engine arithmetic exactly:
    xm = signed(XXH64(shingle)) mod P, sig_i = min (a_i*xm+b_i) mod P,
    band key = 31x fold of the band's r signature values (uint64 wrap).
    `sets` is the oracle-SQL per-doc shingle STRING lists."""
    hcache = {}
    def xm_of(sh):
        v = hcache.get(sh)
        if v is None:
            u = xxh64(sh.encode("utf-8"))
            s = u - (1 << 64) if u >= (1 << 63) else u
            v = s % _MHP
            hcache[sh] = v
        return v
    docs_xm = [np.array([xm_of(g) for g in r[1]], np.int64) for r in sets]
    a, b = _mh_coeffs(num_hashes)
    n = len(docs_xm)
    sig = np.empty((n, num_hashes), np.int64)
    # chunk docs so the (shingles x num_hashes) temp stays ~100 MB
    lens = np.array([len(d) for d in docs_xm], np.int64)
    i = 0
    while i < n:
        j = i; tot = 0
        while j < n and (tot == 0 or tot + lens[j] <= 100_000):
            tot += lens[j]; j += 1
        xm = np.concatenate([docs_xm[k] for k in range(i, j)]) \
            if tot else np.empty(0, np.int64)
        if tot:
            V = (xm[:, None] * a[None, :] + b[None, :]) % _MHP
            starts = np.zeros(j - i, np.int64)
            starts[1:] = np.cumsum(lens[i:j])[:-1]
            empty = lens[i:j] == 0
            # zero-shingle docs make duplicate/out-of-range reduceat
            # indices (numpy then returns a neighbour's row) — clamp the
            # indices and overwrite those docs with the engine's
            # empty-signature value (all P) via the mask
            red = np.minimum.reduceat(V, np.minimum(starts, tot - 1), axis=0)
            sig[i:j] = np.where(empty[:, None], _MHP, red)
        else:
            sig[i:j] = _MHP
        i = j
    r = num_hashes // bands
    keys = np.full((n, bands), 0, np.uint64)
    for bi in range(bands):
        h = np.full(n, np.uint64(1125899906842597 + bi), np.uint64)
        for j2 in range(r):
            h = h * np.uint64(31) + sig[:, bi * r + j2].astype(np.uint64)
        keys[:, bi] = h
    return keys


# Independent quality floors (VERDICT r10 item 3): above their LSH
# cutovers the gate oracles mirror the engine's own banding, so
# contract-conformance alone could hide a silent recall collapse. These
# checks use ONLY the data's geometry and the documented band layouts —
# no engine pre-images — and require measured recall against the brute
# closure to reach at least (1 - ALLOWANCE) x the pinned independence
# model's population prediction (the r9 model, commit 7ceab67).
MODEL_ALLOWANCE = 0.05

# documented layouts (mirror Dedup.LshBands/LshBandBits and the
# dp_dedup_minhash_lsh gate args: numHashes=128, bands=32 -> r=4)
VEC_BANDS, VEC_BITS = 4, 8
MH_BANDS, MH_ROWS = 32, 4


def recall_floor_vec(name, ids, E, ca, cb, thr, got):
    """Random-hyperplane model: P(bit agrees) = 1 - theta/pi, per band
    (1-theta/pi)^bits, pair recall 1-(1-P)^bands — averaged over the
    brute closure's pairs at their actual angles."""
    if len(ids) <= 10000:
        return None  # brute route: the oracle IS the closure
    ia = np.searchsorted(ids, ca)
    ib = np.searchsorted(ids, cb)
    dots = np.einsum("ij,ij->i", E[ia], E[ib])
    na = np.linalg.norm(E[ia], axis=1)
    nb = np.linalg.norm(E[ib], axis=1)
    true = dots >= thr
    if not true.any():
        return None
    theta = np.arccos(np.clip(dots[true] / (na[true] * nb[true]), -1.0, 1.0))
    p_band = (1.0 - theta / np.pi) ** VEC_BITS
    pred = float(np.mean(1.0 - (1.0 - p_band) ** VEC_BANDS))
    brute = set(zip(ca[true].tolist(), cb[true].tolist()))
    eng = set(zip(got["id_a"].to_numpy(np.int64).tolist(),
                  got["id_b"].to_numpy(np.int64).tolist()))
    measured = len(eng & brute) / len(brute)
    print(f"  [{name}] LSH recall floor: measured {measured:.4f} vs "
          f"model {pred:.4f} over {len(brute)} brute pairs", flush=True)
    if measured < (1 - MODEL_ALLOWANCE) * pred:
        return (f"recall {measured:.4f} below banding-model floor "
                f"{(1 - MODEL_ALLOWANCE) * pred:.4f} (model {pred:.4f})")
    return None


def recall_floor_minhash(name, ids, sets, ca, cb, got):
    """MinHash banding model p = 1-(1-J^r)^b over the true-Jaccard
    closure — J computed exactly per pair with the bitmap counter."""
    if len(ca) == 0:
        return None
    sid = {}
    docs = [np.array(sorted({sid.setdefault(g, len(sid)) for g in r[1]}),
                     np.int64) for r in sets]
    lens = np.array([len(d) for d in docs], np.int64)
    flat = np.concatenate(docs) if docs else np.empty(0, np.int64)
    off = np.zeros(len(docs) + 1, np.int64)
    off[1:] = np.cumsum(lens)
    V = int(flat.max()) + 1 if len(flat) else 1
    ia = np.searchsorted(ids, ca)
    ib = np.searchsorted(ids, cb)
    inter = _bitmap_inter(docs, lens, flat, off, V, ia, ib)
    union = lens[ia] + lens[ib] - inter
    J = inter / np.maximum(union, 1)
    pred = float(np.mean(1.0 - (1.0 - J ** MH_ROWS) ** MH_BANDS))
    brute = set(zip(ca.tolist(), cb.tolist()))
    eng = set(zip(got["id_a"].to_numpy(np.int64).tolist(),
                  got["id_b"].to_numpy(np.int64).tolist()))
    measured = len(eng & brute) / len(brute)
    print(f"  [{name}] LSH recall floor: measured {measured:.4f} vs "
          f"model {pred:.4f} over {len(brute)} true pairs", flush=True)
    if measured < (1 - MODEL_ALLOWANCE) * pred:
        return (f"recall {measured:.4f} below banding-model floor "
                f"{(1 - MODEL_ALLOWANCE) * pred:.4f} (model {pred:.4f})")
    return None


def strict_compare(name, got, exp):
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        return f"schema: spark={gcols} oracle={ecols}"
    got = got[gcols].reset_index(drop=True)
    exp = exp[ecols].reset_index(drop=True)
    if len(got) != len(exp):
        return f"rows: spark={len(got)} oracle={len(exp)}"
    for c in gcols:
        gv, ev = got[c], exp[c]
        if (gv.dtype.kind in "iu" and ev.dtype.kind == "f") or \
           (gv.dtype.kind == "f" and ev.dtype.kind in "iu"):
            return f"col {c}: dtype kind {gv.dtype} vs {ev.dtype}"
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            if not all((a == b) or (pd.isna(a) and pd.isna(b))
                       for a, b in zip(gv, ev)):
                return f"col {c}: float mismatch"
        elif not gv.equals(ev):
            bad = gv != ev
            i = bad[bad].index[0]
            return f"col {c} row {i}: spark={gv.iloc[i]} oracle={ev.iloc[i]}"
    return None


def _cand_cache_path(prefix_sql, src, idcol, key_cfg):
    """Candidates are a pure function of (the oracle's own set-defining
    SQL prefix, source CTE, id column, thresholds) — same key, same
    candidate superset. Several gate oracles share the exact prefix
    text (clusters/soft/split_leakage; minhash_lsh/incremental), so
    caching the generated pair arrays on disk turns the 30-min
    generation into a load for every family member after the first."""
    import hashlib
    h = hashlib.sha256(
        "\x00".join([prefix_sql, src, idcol, repr(sorted(key_cfg.items())),
                     SF]).encode()).hexdigest()[:24]
    root = os.environ.get("GRAFT_TMP", "/tmp")
    os.makedirs(root, exist_ok=True)
    return f"{root}/graft_bigsf_cand_{h}.npz"


def run(name):
    cfg = FAMILY[name]
    sql = oracle[name]
    a, b = cfg.get("aliases", ("a", "b"))
    src, mode = cfg["src"], cfg["mode"]
    idcol = cfg.get("idcol", "doc_id")
    floor_fn = None  # set for rows with an independent recall floor
    if mode == "jaccard":
        win = cfg.get("nchars_window")
        pfx = sets_prefix(sql, src, a, b)
        cpath = _cand_cache_path(pfx, src, idcol,
                                 dict(mode=mode, t=cfg["t"], win=win))
        tpath = cpath[:-4] + "_true.npz"
        extra = ", n_chars" if win is not None else ""
        sets = con.execute(
            f"{pfx} SELECT {idcol}, sh{extra} FROM {src} ORDER BY {idcol}"
        ).fetchall()
        ids = np.array([r[0] for r in sets], np.int64)
        if os.path.exists(tpath):
            z = np.load(tpath)
            ca, cb = z["ca"], z["cb"]
            print(f"  [{name}] true-pair cache hit: {tpath}", flush=True)
        else:
            if os.path.exists(cpath):
                z = np.load(cpath)
                ca, cb = z["ca"], z["cb"]
                print(f"  [{name}] candidate cache hit: {cpath}", flush=True)
            else:
                nch = (np.array([r[2] for r in sets], np.int64)
                       if win is not None else None)
                ca, cb = jaccard_candidates(ids, [r[1] for r in sets],
                                            *cfg["t"],
                                            nchars=nch, nchars_window=win)
                np.savez_compressed(cpath + ".tmp.npz", ca=ca, cb=cb)
                os.replace(cpath + ".tmp.npz", cpath)
            # Registering the full superset as `cand` made DuckDB's join
            # the bottleneck at sf1 (10^8-10^9 pair rows). J >= t is
            # exact integer arithmetic — i*(td+tn) >= tn*(|A|+|B|) — so
            # prefilter the superset to the TRUE Jaccard pairs with the
            # bitmap counter; the oracle SQL still re-applies ALL its
            # own predicates (intersections, unions, windows) on every
            # surviving pair. Cached per family like the candidates.
            t_num, t_den = cfg["t"]
            sid = {}
            docs = [np.array(sorted({sid.setdefault(g, len(sid))
                                     for g in r[1]}), np.int64)
                    for r in sets]
            lens = np.array([len(d) for d in docs], np.int64)
            flat = np.concatenate(docs) if docs else np.empty(0, np.int64)
            off = np.zeros(len(docs) + 1, np.int64)
            off[1:] = np.cumsum(lens)
            V = int(flat.max()) + 1 if len(flat) else 1
            ia = np.searchsorted(ids, ca)
            ib = np.searchsorted(ids, cb)
            inter = _bitmap_inter(docs, lens, flat, off, V, ia, ib)
            ok = inter * (t_den + t_num) >= t_num * (lens[ia] + lens[ib])
            ca, cb = ca[ok], cb[ok]
            print(f"  [{name}] {int(ok.sum())} true pairs of {len(ok)} "
                  f"candidates", flush=True)
            np.savez_compressed(tpath + ".tmp.npz", ca=ca, cb=cb)
            os.replace(tpath + ".tmp.npz", tpath)
        if cfg.get("stream_survivors"):
            # drop-set derivation over the band-contract pair set; the
            # expected survivor frame then re-reads doc_id/n_chars from
            # the documents table itself (the columns the gate emits)
            keys = minhash_band_keys(sets, *cfg.get("band_layout", (128, 32)))
            ia = np.searchsorted(ids, ca)
            ib = np.searchsorted(ids, cb)
            shares = (keys[ia] == keys[ib]).any(axis=1)
            if int((~shares).sum()):
                print(f"  [{name}] banding contract excludes "
                      f"{int((~shares).sum())} of {len(ca)} true pairs",
                      flush=True)
            sa, sb = ca[shares], cb[shares]
            batch = set(int(i) for i in ids[ids % 5 == 0])
            dropped = set()
            for x, y in zip(sa.tolist(), sb.tolist()):
                bx, by = x in batch, y in batch
                if bx and by:
                    dropped.add(max(x, y))  # in-batch: larger id drops
                elif bx:
                    dropped.add(x)          # cross pair: batch doc drops
                elif by:
                    dropped.add(y)
            surv = sorted(i for i in batch if i not in dropped)
            print(f"  [{name}] {len(surv)} survivors of {len(batch)} "
                  f"batch docs", flush=True)
            sdf = pd.DataFrame({"doc_id": np.array(surv, np.int64)})
            con.register("surv", sdf)
            exp = con.execute(
                "SELECT d.doc_id, d.n_chars FROM documents d "
                "JOIN surv USING (doc_id) ORDER BY d.doc_id").fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
            return strict_compare(name, got, exp)
        if name == "dp_dedup_minhash_lsh":
            def floor_fn(got, ids=ids, sets=sets, ca=ca, cb=cb):
                return recall_floor_minhash(name, ids, sets, ca, cb, got)
        if cfg.get("numpy_pairs"):
            # exact NumPy pair columns over the true-pair closure
            # FILTERED BY THE DOCUMENTED BANDING CONTRACT (see the
            # minhash_band_keys comment): the expected frame is the
            # oracle's WHERE set (J >= t implies its length-ratio
            # condition) restricted to pairs sharing >= 1 of the
            # engine-arithmetic band keys, with inter/union computed by
            # the exact bitmap counter
            sid = {}
            docs = [np.array(sorted({sid.setdefault(g, len(sid))
                                     for g in r[1]}), np.int64)
                    for r in sets]
            lens = np.array([len(d) for d in docs], np.int64)
            flat = np.concatenate(docs) if docs else np.empty(0, np.int64)
            off = np.zeros(len(docs) + 1, np.int64)
            off[1:] = np.cumsum(lens)
            V = int(flat.max()) + 1 if len(flat) else 1
            ia = np.searchsorted(ids, ca)
            ib = np.searchsorted(ids, cb)
            if cfg.get("band_contract"):
                keys = minhash_band_keys(sets, *cfg.get("band_layout", (128, 32)))
                shares = (keys[ia] == keys[ib]).any(axis=1)
                print(f"  [{name}] banding contract excludes "
                      f"{int((~shares).sum())} of {len(ca)} true pairs", flush=True)
                ia, ib = ia[shares], ib[shares]
            else:
                shares = np.ones(len(ca), bool)
            inter = _bitmap_inter(docs, lens, flat, off, V, ia, ib)
            exp = pd.DataFrame({
                "id_a": ca[shares], "id_b": cb[shares],
                "inter_cnt": inter,
                "union_cnt": lens[ia] + lens[ib] - inter,
            }).sort_values(["id_a", "id_b"]).reset_index(drop=True)
            print(f"  [{name}] {len(exp)} contract pairs -> NumPy exact "
                  f"inter/union verify", flush=True)
            got = con.execute(
                f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
            err = strict_compare(name, got, exp)
            if not err and floor_fn is not None:
                err = floor_fn(got)
            return err
    elif mode == "containment":
        pfx = sets_prefix(sql, src, a, b)
        cpath = _cand_cache_path(pfx, src, idcol, dict(mode=mode, t=cfg["t"]))
        # per-doc sets always come from the oracle's own SQL prefix;
        # needed both for candidate generation and the NumPy verify
        sets = con.execute(
            f"{pfx} SELECT {idcol}, sh FROM {src} ORDER BY {idcol}"
        ).fetchall()
        ids = np.array([r[0] for r in sets], np.int64)
        shingle_id = {}
        docs = [np.array(sorted({shingle_id.setdefault(g, len(shingle_id))
                                 for g in r[1]}), np.int64) for r in sets]
        if os.path.exists(cpath):
            z = np.load(cpath)
            ca, cb = z["ca"], z["cb"]
            print(f"  [{name}] candidate cache hit: {cpath}", flush=True)
        else:
            ca, cb = containment_candidates(ids, [r[1] for r in sets], *cfg["t"])
            np.savez_compressed(cpath + ".tmp.npz", ca=ca, cb=cb)
            os.replace(cpath + ".tmp.npz", cpath)
    elif mode == "simhash":
        sims = con.execute(
            f"{sets_prefix(sql, src, a, b)} SELECT {idcol}, sim FROM {src} ORDER BY {idcol}"
        ).fetchdf()
        ca, cb = simhash_candidates(
            sims[idcol].to_numpy(np.int64), sims["sim"].to_numpy(np.int64))
    elif mode == "vec":
        emb = con.execute(
            f"SELECT {idcol}, CAST(embedding AS DOUBLE[]) AS v "
            f"FROM embeddings ORDER BY {idcol}").fetchdf()
        ids = emb[idcol].to_numpy(np.int64)
        E = np.stack(emb["v"].to_numpy())
        ca, cb = vec_candidates(ids, E, cfg["thr"])
        if name == "dp_embed_neardup":
            def floor_fn(got, ids=ids, E=E, ca=ca, cb=cb, thr=cfg["thr"]):
                return recall_floor_vec(name, ids, E, ca, cb, thr, got)
    if os.environ.get("GRAFT_CAND_ONLY"):
        # pre-generation mode: populate the candidate cache (the 30-min
        # part) for this row's family and skip the verify — lets several
        # families' caches build in parallel while the serial sweep is
        # busy verifying another row
        print(f"  [{name}] candidates cached ({len(ca)} pairs), "
              f"verify skipped (GRAFT_CAND_ONLY)", flush=True)
        return None
    if mode == "containment":
        # 445M directed candidates x list_intersect made the rewritten
        # DuckDB join exceed a 2 h budget at sf1; the pair arithmetic
        # (|A∩B| and the c-predicate) is integer set intersection, so
        # compute it exactly in NumPy instead. The sets themselves are
        # still the oracle SQL's own expressions (fetched above), and
        # this path is validated at sf0.01 against the DuckDB-proven
        # gate outputs before any sf1 verdict is trusted — same trust
        # pattern as tools/pq_replay.py / dedup_stats_replay.py.
        print(f"  [{name}] {len(ca)} directed candidates -> NumPy exact "
              f"intersection verify", flush=True)
        cf, cx = cfg.get("cap", (1.0, 0))
        exp = containment_expected(ids, docs, ca, cb, *cfg["t"],
                                   cap_frac=cf, cap_abs=cx)
        got = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
        return strict_compare(name, got, exp)
    if mode == "jaccard" and cfg.get("band_contract"):
        # restrict the injected pair set to the documented banding
        # contract (shares >= 1 engine-arithmetic band key) — the same
        # predicate the dp_dedup_minhash_lsh replay applies, so the
        # closure/split rows inherit the banded pair set their engine
        # plans actually consume instead of the brute superset
        keys = minhash_band_keys(sets, *cfg.get("band_layout", (128, 32)))
        ia = np.searchsorted(ids, ca)
        ib = np.searchsorted(ids, cb)
        shares = (keys[ia] == keys[ib]).any(axis=1)
        if int((~shares).sum()):
            print(f"  [{name}] banding contract excludes "
                  f"{int((~shares).sum())} of {len(ca)} true pairs", flush=True)
        ca, cb = ca[shares], cb[shares]
    if cfg.get("both_dirs"):
        ca, cb = np.r_[ca, cb], np.r_[cb, ca]
    cand = pd.DataFrame({"id_a": ca, "id_b": cb})
    con.register("cand", cand)
    print(f"  [{name}] {len(cand)} candidate pairs", flush=True)
    # dp_dedup_semantic's pair CTE aliases the same table; dp_curate's
    # join is over sh2 inside the pairs CTE — the single rewrite
    # handles both because the textual join shape is identical
    exp = con.execute(rewrite_join(sql, src, idcol, a, b)).fetchdf()
    got = con.execute(
        f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
    err = strict_compare(name, got, exp)
    if not err and floor_fn is not None:
        err = floor_fn(got)
    return err


if __name__ == "__main__":
    bad = []
    for name in NAMES:
        if name not in FAMILY:
            print(f"  FAIL {name}: no replay config"); bad.append(name); continue
        try:
            err = run(name)
        except Exception as e:
            err = f"replay error: {e}"
        if err:
            print(f"  FAIL {name}: {err}"); bad.append(name)
        else:
            print(f"  PASS {name} (candidate-superset replay)")
    sys.exit(1 if bad else 0)
