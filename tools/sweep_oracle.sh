#!/usr/bin/env bash
# Cross-SF oracle sweep: run the full Verify -> DuckDB gate at every
# scale factor in one command. Scale-dependent divergences (wider
# decimals, window ties, hash-range effects) have twice been caught
# only at sf0.1 — this makes the three-SF check routine instead of
# optional.
#
# Usage: tools/sweep_oracle.sh [sf ...]     (default: 0.001 0.01 0.1)
set -u
cd "$(dirname "$0")/.."
if [ $# -gt 0 ]; then SFS=("$@"); else SFS=(0.001 0.01 0.1); fi
# Fail fast on data-contract drift BEFORE paying three multi-minute
# Verify runs: the pyarrow canary names the drift in ~1 s (the JVM
# canary inside Verify would only surface it in $out.log). See
# tools/canary.py; the round-9 ts-layout drift is the motivating case.
DIRS=()
for sf in "${SFS[@]}"; do DIRS+=("/root/testdata/sf$sf"); done
if ! python3 tools/canary.py "${DIRS[@]}"; then
  echo "SWEEP: FAIL (data-contract canary, see CANARY lines above)"
  exit 1
fi
FAILED=0
for sf in "${SFS[@]}"; do
  out="/tmp/graft_sweep_sf$sf"
  rm -rf "$out"
  echo "=== sf$sf: verify dump ==="
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out" >"$out.log" 2>&1
  if [ ! -f "$out/oracle_sql.json" ]; then
    echo "sf$sf: Verify produced no oracle_sql.json (see $out.log)"
    FAILED=1
    continue
  fi
  echo "=== sf$sf: oracle check ==="
  res=$(python3 tools/check_oracle.py "$out" "/root/testdata/sf$sf" 2>&1)
  echo "$res" | grep -E "^(FAIL|ERROR)" || true
  summary=$(echo "$res" | tail -1)
  echo "sf$sf: $summary"
  echo "$summary" | grep -q ", 0 failed" || FAILED=1
done
if [ "$FAILED" -ne 0 ]; then
  echo "SWEEP: FAIL"
  exit 1
fi
echo "SWEEP: PASS (all SFs)"
