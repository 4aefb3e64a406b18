#!/usr/bin/env bash
# Per-query sf1 oracle certification with a per-query DuckDB timeout:
# check.py runs queries sequentially, so one pathological oracle (the
# documented quadratic floors) must not block the batch. Emits one
# OK/FAIL/TIMEOUT line per query to stdout, and exits nonzero if ANY
# query failed or timed out (ADVICE r13: callers gating on exit status
# must not read a failed batch as a pass).
# Usage: scripts/certify_sf1.sh <sfDir> <verifyOutDir> <timeoutSec> <query...>
set -uo pipefail
cd "$(dirname "$0")/.."
SF="$1"; OUT="$2"; TMO="$3"; shift 3
fails=0
for q in "$@"; do
  res=$(timeout "$TMO" python3 scripts/check.py "$SF" "$OUT" "$q" 2>&1)
  rc=$?
  if [ $rc -eq 124 ]; then
    echo "TIMEOUT $q (>${TMO}s DuckDB-side)"
    fails=$((fails + 1))
  elif echo "$res" | grep -qE "^OK"; then
    echo "$res" | grep -E "^OK"
  else
    echo "$res" | grep -E "^(OK|FAIL)" || echo "FAIL $q: $res" | head -2
    fails=$((fails + 1))
  fi
done
if [ "$fails" -gt 0 ]; then
  echo "certify: $fails of $# queries FAILED/TIMED OUT"
  exit 1
fi
