#!/bin/bash
# Pre-snapshot commit gate (round-3 postmortem: a round's entire output
# was nullified by an uncompiled one-liner). Runs in ~2 min:
#   1. sbt compile  — the 4-second check round 3 never ran
#   2. full Verify at sf0.001 + DuckDB oracle compare
#   3. fast-fail if SparkEntry has duplicate query names
# Usage: scripts/gate.sh   (exit 0 = safe to snapshot)
set -e
cd "$(dirname "$0")/.."
sbt -batch compile
out=$(mktemp -d)
trap 'rm -rf "$out"' EXIT
scripts/run.sh graft.Verify /root/testdata/sf0.001 "$out" >/dev/null 2>&1
# check.py also hard-fails driver-UNHASHABLE output shapes (nested or
# DECIMAL columns — the r14 x141s/t/u + x142j lesson), so a shape
# regression can never reach a round boundary through this gate
python3 scripts/check.py /root/testdata/sf0.001 "$out"
# bench regression gate: top-10 expensive queries vs the committed baseline
# (>2x per-query fails; skip with SKIP_BENCH_GATE=1 for doc-only snapshots)
if [ "${SKIP_BENCH_GATE:-0}" != "1" ]; then
  python3 scripts/benchgate.py
fi
# plan-digest regression gate: a digest flip names exactly the queries whose
# physical plan changed — eyeball target/plan_dump/<name>.txt before
# committing the refreshed ledger (round-11 addition; skip for doc-only)
if [ "${SKIP_PLAN_GATE:-0}" != "1" ]; then
  # digest lands in the per-run mktemp dir: a fixed /tmp path would race
  # two concurrent gate runs into diffing each other's output
  scripts/run.sh graft.PlanDigest /root/testdata/sf0.001 "$out/plan_gate.txt" \
    target/plan_dump >/dev/null 2>&1
  if ! diff -q PLAN_DIGESTS.txt "$out/plan_gate.txt" >/dev/null; then
    echo "PLAN DIGEST DRIFT (review + refresh PLAN_DIGESTS.txt):"
    diff PLAN_DIGESTS.txt "$out/plan_gate.txt" | grep '^[<>]' | head -20
    exit 1
  fi
fi
echo "GATE OK"
