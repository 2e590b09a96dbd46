#!/usr/bin/env python3
"""Substring-family scale probe: measure the 6 fingerprint-kernel rows
at sf1 AND an sfN replica (default sf5) with clean health stamps, so
the family's scaling EXPONENT — not just the sf1 16x constant — is a
committed artifact (VERDICT r13 task 1; the kernels' 100 TB case rests
on the exchange shape staying near-linear, see SubstringFingerprint
.scala contract and Dedup.scala:883).

Both legs run under ONE protocol and ONE consumer (graft.Bench r14:
full-plan toRdd consume — count() used to let the optimizer prune the
removal rows' entire rewrite, so their historical numbers measured a
parquet row count; that is why this probe re-measures sf1 itself
instead of reading BENCH_FULL_sf1).

Protocol (everything serialized — sbt must never run concurrently):
  1. Build replicas via make_big_sf.py if missing (R=10 -> sf1,
     R=50 -> sf5: id-remapped, per-replica text prefixes keep exact
     dedup meaningful).
  2. PRE health stamp: `graft.Bench` in probe mode at sf0.1 against
     the pinned BENCH_FLOOR.json (the same entry gate official sweeps
     use; Bench itself rest-retries a dirty box).
  3. Timed sweeps at sf1 then sfN with ONLY=<rows>, two samples per
     row (Bench protocol), floors auto-disabled at non-pinned sfs —
     stamps come from steps 2/4.
  4. POST health stamp: probe mode at sf0.1 again. A stamp that stays
     throttled marks the artifact degraded; re-run later.
  5. Emit the artifact: per-row samples at sf1 + sfN, the pinned
     sf0.1 reference (BENCH_REF.json), and per-row scaling exponents
     log(t_b/t_a)/log(sf_b/sf_a) for sf1->sfN and sf0.1->sf1.

Usage:
  python3 tools/substr_scale_probe.py [R] [sfDir] [--artifact=PATH]
      [--rows=a,b,c] [--sf1=DIR]
Defaults: R=50, sfDir=/dev/shm/graft_sf5, sf1=/dev/shm/graft_sf1,
artifact=BENCH_substr_sf5.json.
"""
import json
import math
import os
import re
import subprocess
import sys
import time

R = 50
SF = "/dev/shm/graft_sf5"
SF1 = "/dev/shm/graft_sf1"
ROWS = ("dp_dedup_substring,dp_dedup_substring_winnow,dp_dedup_substring_incr,"
        "dp_dedup_substring_remove,dp_dedup_substring_remove_incr,dp_span_attribution")
ARTIFACT = None
pos = [a for a in sys.argv[1:] if not a.startswith("--")]
if len(pos) > 0:
    R = int(pos[0])
if len(pos) > 1:
    SF = pos[1]
for a in sys.argv[1:]:
    if a.startswith("--artifact="):
        ARTIFACT = a.split("=", 1)[1]
    if a.startswith("--rows="):
        ROWS = a.split("=", 1)[1]
    if a.startswith("--sf1="):
        SF1 = a.split("=", 1)[1]
LABEL = f"sf{R / 10:g}"
if ARTIFACT is None:
    ARTIFACT = f"BENCH_substr_{LABEL}.json"
TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)


def run_bench(env_extra, tag):
    env = dict(os.environ)
    env.update(env_extra)
    t0 = time.time()
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=14400)
    dt = time.time() - t0
    sys.stderr.write(f"[probe] {tag}: rc={r.returncode} wall={dt:.0f}s\n")
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:] + "\n")
        raise SystemExit(f"{tag} failed")
    return r.stdout


def stamp(tag):
    """Probe-mode Bench at sf0.1: returns the env + floors JSON."""
    out = run_bench({"SPARK_GRAFT_BENCH_PROBE": "1",
                     "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1"}, tag)
    for line in out.splitlines():
        m = re.search(r'\{"probe":true.*\}', line)
        if m:
            return json.loads(m.group(0))
    raise SystemExit(f"{tag}: no probe line in Bench output")


def ensure_replica(r, d):
    if not os.path.exists(f"{d}/documents.parquet"):
        sys.stderr.write(f"[probe] building R={r} replica at {d}\n")
        subprocess.run([sys.executable, f"{TOOLS}/make_big_sf.py", str(r), d],
                       check=True)


def sweep(d, label):
    out = f"/tmp/graft_bench_substr_{label}.json"
    run_bench({"SPARK_GRAFT_SF_DIR": d,
               "SPARK_GRAFT_BENCH_ONLY": ROWS,
               "SPARK_GRAFT_BENCH_OUT": out}, f"{label} sweep")
    with open(out) as f:
        return json.load(f)


def main():
    ensure_replica(10, SF1)
    ensure_replica(R, SF)
    pre = stamp("pre-stamp")
    sys.stderr.write(f"[probe] pre stamp: {pre['env']}\n")
    s1 = sweep(SF1, "sf1")
    sN = sweep(SF, LABEL)
    post = stamp("post-stamp")
    sys.stderr.write(f"[probe] post stamp: {post['env']}\n")

    rows = ROWS.split(",")
    ref01 = {}
    try:
        with open(f"{REPO}/BENCH_REF.json") as f:
            ref01 = {k: v for k, v in json.load(f)["queries"].items() if k in rows}
    except Exception:
        pass

    n = R / 10.0  # scale relative to sf1
    exps = {}
    for k in rows:
        t1 = s1["queries"].get(k)
        tn = sN["queries"].get(k)
        e = {}
        if t1 and tn:
            e["sf1_to_" + LABEL] = round(math.log(tn / t1) / math.log(n), 3)
        if t1 and ref01.get(k):
            e["sf0.1_to_sf1"] = round(math.log(t1 / ref01[k]) / math.log(10), 3)
        if e:
            exps[k] = e

    art = {
        "comment": ("Substring/fingerprint-family scale probe: per-row "
                    "seconds at sf1 and %s (make_big_sf replicas), both "
                    "measured in-probe under the r14 full-plan consumer "
                    "(count() previously pruned the removal rows' entire "
                    "rewrite), bracketed by sf0.1 probe-mode health stamps "
                    "against the pinned BENCH_FLOOR. exponents = log-time "
                    "ratio / log-scale ratio; 1.0 = linear in corpus size. "
                    "sf0.1 column = pinned BENCH_REF capability (same "
                    "consumer only from r14 on)." % LABEL),
        "sf": LABEL,
        "R": R,
        "rows": rows,
        "queries_s_sf1": {k: s1["queries"].get(k) for k in rows},
        "query_samples_s_sf1": {k: s1.get("query_samples", {}).get(k) for k in rows},
        "queries_s": {k: sN["queries"].get(k) for k in rows},
        "query_samples_s": {k: sN.get("query_samples", {}).get(k) for k in rows},
        "ref_sf0.1_s": ref01,
        "exponents": exps,
        "env_pre": pre["env"],
        "env_post": post["env"],
        "degraded": bool(pre["env"].get("throttled") or post["env"].get("throttled")),
    }
    with open(f"{REPO}/{ARTIFACT}", "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    sys.stderr.write(f"[probe] wrote {ARTIFACT}\n")
    print(json.dumps({k: art["queries_s"][k] for k in rows}))
    if art["degraded"]:
        sys.stderr.write("[probe] WARNING: a health stamp was throttled - "
                         "treat the artifact as an upper bound and re-run\n")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
