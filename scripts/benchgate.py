#!/usr/bin/env python3
"""Bench regression gate (round-5 verdict item 7): re-run the top-N most
expensive queries from the committed baseline and fail on a >2x per-query
regression, so a performance regression (or a measurement anomaly like the
r5 x60/x62 divergence) blocks the snapshot instead of surfacing in the
verdict.

Usage: python3 scripts/benchgate.py [baseline] [topN]
  baseline  full bench artifact (default BENCH_BASELINE.json, written by
            `SPARK_GRAFT_BENCH_OUT=BENCH_BASELINE.json ... graft.Bench`)
  topN      how many of the baseline's slowest queries to re-run (default 10)

Artifact mode (round-12 verdict item 7 — the per-query variance ledger):
  python3 scripts/benchgate.py --min-of runA.json runB.json [...] \
      [--baseline BENCH_BASELINE.json] [--all|--top N]
compares the PER-QUERY MIN across the given quiet full-suite runs
against the baseline, re-running nothing. Two independent quiet runs
exist per round (BENCH_LOCAL_rN + BENCH_FULL); a query is only flagged
when it exceeds the bar in EVERY run — single-run spikes (x93/x94/x96
in r11, x112 in r12: box contention, not plans) stop consuming verdict
cycles, while a real plan regression still fails in both runs.

Tolerance (both modes): got > 2*base + 0.5s — the absolute slack keeps
sub-second queries from tripping the gate on JVM noise.
"""
import json, os, subprocess, sys

def min_of_runs(argv):
    runs, baseline_path, top_n, use_all = [], "BENCH_BASELINE.json", None, False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--baseline":
            baseline_path = argv[i + 1]; i += 2
        elif a == "--top":
            top_n = int(argv[i + 1]); i += 2
        elif a == "--all":
            use_all = True; i += 1
        else:
            runs.append(a); i += 1
    if not runs:
        print("benchgate --min-of: no run artifacts given"); return 1
    base = json.load(open(baseline_path))["queries"]
    datas = [json.load(open(r)) for r in runs]
    merged = {}
    for d in datas:
        for k, v in d["queries"].items():
            if v is not None:
                merged[k] = min(merged.get(k, v), v)
    keys = sorted(((v, k) for k, v in base.items() if v is not None),
                  reverse=True)
    if not use_all:
        keys = keys[:(top_n or 10)]
    bad = []
    for v, k in keys:
        g = merged.get(k)
        if g is None:
            # absent (or null) in EVERY run: a crashed/dropped query must
            # fail loudly, not silently leave the gate
            bad.append((k, v, "missing from every run"))
        elif g > 2 * v + 0.5:
            # min over the runs that contain it: flagged only when every
            # covering run exceeds the bar (one clean run clears it)
            bad.append((k, v, g))
    shown = "all" if use_all else f"top {len(keys)}"
    print(f"benchgate --min-of: {len(runs)} runs, {shown} baseline "
          f"queries, {len(bad)} over the 2x+0.5s bar")
    for k, v, g in bad:
        print(f"benchgate FAIL {k}: baseline {v} -> min-of-runs {g}")
    return 1 if bad else 0

def record_missing(argv):
    """r13-verdict item 6: extend the baseline to queries it never
    covered (the gate silently skipped them). For every query present in
    the given QUIET full-suite runs but absent from the baseline, record
    the per-query MIN across the runs as its regression bar. Never
    touches existing entries — the original reference-vintage numbers
    stay the bar for the queries they cover."""
    runs, baseline_path = [], "BENCH_BASELINE.json"
    i = 0
    while i < len(argv):
        if argv[i] == "--baseline":
            baseline_path = argv[i + 1]; i += 2
        else:
            runs.append(argv[i]); i += 1
    if not runs:
        print("benchgate --record-missing: no run artifacts given"); return 1
    baseline = json.load(open(baseline_path))
    base = baseline["queries"]
    merged = {}
    for r in runs:
        for k, v in json.load(open(r))["queries"].items():
            if v is not None:
                merged[k] = min(merged.get(k, v), v)
    added = {k: v for k, v in merged.items() if k not in base}
    base.update(added)
    tmp = baseline_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(baseline, f, indent=None, sort_keys=True)
        f.write("\n")
    os.replace(tmp, baseline_path)
    print(f"benchgate --record-missing: {len(added)} queries added "
          f"(baseline now {len(base)}): {sorted(added)}")
    return 0

def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--min-of":
        return min_of_runs(sys.argv[2:])
    if len(sys.argv) > 1 and sys.argv[1] == "--record-missing":
        return record_missing(sys.argv[2:])
    baseline_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_BASELINE.json"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if not os.path.exists(baseline_path):
        print(f"benchgate: no {baseline_path}; skipping (create one with "
              "SPARK_GRAFT_BENCH_OUT after a clean full bench)")
        return 0
    baseline = json.load(open(baseline_path))
    base = baseline["queries"]
    # re-run at the SAME scale the baseline recorded (its "sf" field is the
    # data dir); a caller-exported SPARK_GRAFT_SF_DIR wins only if it
    # matches — comparing across scales measures scale, not regression
    base_sf = baseline.get("sf", "/root/testdata/sf0.1")
    env_sf = os.environ.get("SPARK_GRAFT_SF_DIR", base_sf)
    if env_sf != base_sf:
        print(f"benchgate: SPARK_GRAFT_SF_DIR={env_sf} does not match the "
              f"baseline's sf={base_sf}; refusing a cross-scale comparison")
        return 1
    top = sorted(((v, k) for k, v in base.items() if v is not None),
                 reverse=True)[:top_n]
    prefixes = ",".join(k for _, k in top)
    out = "/tmp/benchgate_out.json"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=base_sf,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_GRAFT_BENCH_OUT=out)
    subprocess.run(["scripts/run.sh", "graft.Bench", prefixes], env=env,
                   check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    got = json.load(open(out))
    bad = []
    for v, k in top:
        g = got["queries"].get(k)
        if g is None:
            bad.append((k, v, "failed"))
        elif g > 2 * v + 0.5:
            bad.append((k, v, g))
        else:
            print(f"benchgate OK  {k}: {g:.2f}s (baseline {v:.2f}s)")
    if got.get("leaks"):
        print(f"benchgate: persistent-RDD leaks detected: {got['leaks']}")
        bad.append(("<leaks>", 0, got["leaks"]))
    for k, v, g in bad:
        print(f"benchgate FAIL {k}: baseline {v} -> {g}")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main())
