#!/bin/bash
# Correctness matrix: every oracle query at {sf0.001, sf0.01, sf0.1} ×
# {4, 32} cores/shuffle-partitions. Different partition counts change
# reduction order, so a query whose rounding sits on a double-summation
# boundary flips somewhere in this matrix — zero flips is the evidence
# the round(sum(double)) family is safe at these scales (see ROUND_NOTES
# round-6 sweep). Usage: scripts/matrix.sh [outRoot] (default /tmp/matrix)
set -e
cd "$(dirname "$0")/.."
root="${1:-/tmp/matrix}"
mkdir -p "$root"
fail=0
for sf in 0.001 0.01 0.1; do
  for cpus in 4 32; do
    out="$root/sf${sf}_c${cpus}"
    rm -rf "$out"
    echo "== sf$sf cpus=$cpus"
    SPARK_GRAFT_CPUS=$cpus SPARK_DRIVER_MEM=24g \
      scripts/run.sh graft.Verify /root/testdata/sf$sf "$out" >/dev/null 2>&1
    if python3 scripts/check.py /root/testdata/sf$sf "$out" > "$out.check" 2>&1; then
      tail -1 "$out.check"
    else
      echo "MATRIX CELL FAILED: sf$sf cpus=$cpus"; grep ^FAIL "$out.check"; fail=1
    fi
  done
done
exit $fail
