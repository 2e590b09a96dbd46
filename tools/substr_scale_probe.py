#!/usr/bin/env python3
"""Substring-family scale probe: measure the 6 fingerprint-kernel rows
at an sf5 (or sfN) replica with clean health stamps, so the family's
scaling EXPONENT — not just the sf1 16x constant — is a committed
artifact (VERDICT r13 task 1; the kernels' 100 TB case rests on the
exchange shape staying near-linear, see SubstringFingerprint.scala
contract and Dedup.scala:883).

Protocol (everything serialized — sbt must never run concurrently):
  1. Build the replica via make_big_sf.py R <sfDir> if missing
     (R=50 -> sf5: 50x the sf0.1 tables, id-remapped, per-replica
     text prefixes keep exact dedup meaningful).
  2. PRE health stamp: `graft.Bench` in probe mode at sf0.1 against
     the pinned BENCH_FLOOR.json (the same entry gate official sweeps
     use; Bench itself rest-retries a dirty box).
  3. The timed run: `graft.Bench` at <sfDir> with ONLY=<rows>, two
     samples per row (Bench protocol), floors auto-disabled at the
     non-pinned sf (Bench r14 behavior) — stamps come from steps 2/4.
  4. POST health stamp: probe mode at sf0.1 again. A probe run that
     stays dirty marks the artifact degraded; re-run later.
  5. Emit the artifact: per-row samples at sfN + the pinned sf0.1
     reference (BENCH_REF.json) and the sf1 artifact
     (BENCH_FULL_sf1.json) + per-row scaling exponents
     log(t_b/t_a)/log(sf_b/sf_a) for sf1->sfN (and sf0.1->sf1).

Usage:
  python3 tools/substr_scale_probe.py [R] [sfDir] [--artifact=PATH]
      [--rows=a,b,c]
Defaults: R=50, sfDir=/dev/shm/graft_sf5, artifact=BENCH_substr_sf5.json.
"""
import json
import os
import re
import subprocess
import sys
import time

R = 50
SF = "/dev/shm/graft_sf5"
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


def main():
    if not os.path.exists(f"{SF}/documents.parquet"):
        sys.stderr.write(f"[probe] building {LABEL} replica at {SF} (R={R})\n")
        subprocess.run([sys.executable, f"{TOOLS}/make_big_sf.py", str(R), SF],
                       check=True)
    pre = stamp("pre-stamp")
    sys.stderr.write(f"[probe] pre stamp: {pre['env']}\n")
    bench_out = f"/tmp/graft_bench_substr_{LABEL}.json"
    run_bench({"SPARK_GRAFT_SF_DIR": SF,
               "SPARK_GRAFT_BENCH_ONLY": ROWS,
               "SPARK_GRAFT_BENCH_OUT": bench_out}, f"{LABEL} sweep")
    with open(bench_out) as f:
        sweep = json.load(f)
    post = stamp("post-stamp")
    sys.stderr.write(f"[probe] post stamp: {post['env']}\n")

    rows = ROWS.split(",")
    ref01 = {}
    try:
        with open(f"{REPO}/BENCH_REF.json") as f:
            ref01 = {k: v for k, v in json.load(f)["queries"].items() if k in rows}
    except Exception:
        pass
    sf1 = {}
    try:
        with open(f"{REPO}/BENCH_FULL_sf1.json") as f:
            sf1 = {k: v for k, v in json.load(f)["queries"].items() if k in rows}
    except Exception:
        pass

    import math
    n = R / 10.0  # scale relative to sf1
    exps = {}
    for k in rows:
        t = sweep["queries"].get(k)
        e = {}
        if t and sf1.get(k):
            e["sf1_to_" + LABEL] = round(math.log(t / sf1[k]) / math.log(n), 3)
        if sf1.get(k) and ref01.get(k):
            e["sf0.1_to_sf1"] = round(math.log(sf1[k] / ref01[k]) / math.log(10), 3)
        if e:
            exps[k] = e

    art = {
        "comment": ("Substring/fingerprint-family scale probe: per-row "
                    "seconds at %s (R=%d x sf0.1, make_big_sf replica), "
                    "bracketed by sf0.1 probe-mode health stamps against "
                    "the pinned BENCH_FLOOR. exponents = log-time ratio / "
                    "log-scale ratio; 1.0 = linear in corpus size. sf0.1 "
                    "column = pinned BENCH_REF capability; sf1 column = "
                    "committed BENCH_FULL_sf1." % (LABEL, R)),
        "sf": LABEL,
        "R": R,
        "rows": rows,
        "queries_s": {k: sweep["queries"].get(k) for k in rows},
        "query_samples_s": {k: sweep.get("query_samples", {}).get(k) for k in rows},
        "ref_sf0.1_s": ref01,
        "sf1_s": sf1,
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
