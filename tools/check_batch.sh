#!/bin/bash
# Per-query timeout wrapper around check.py, for engine-inflated scale
# runs where a single mis-scaled oracle must not hang the whole pass.
# Usage: tools/check_batch.sh <sfDir> <verifyOutDir> [timeoutSec]
set -uo pipefail
cd "$(dirname "$0")/.."
SF="$1"; OUT="$2"; TMO="${3:-240}"
NAMES=$(python3 -c "import json;print(' '.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")
pass=0; fail=0; tmo=0
for n in $NAMES; do
  [ -d "$OUT/$n" ] || continue
  if out=$(timeout "$TMO" python3 tools/check.py "$SF" "$OUT" "$n" 2>&1); then
    if echo "$out" | grep -q "^PASS"; then pass=$((pass+1)); else
      fail=$((fail+1)); echo "$out" | grep -v "^== "; fi
  else
    rc=$?
    if [ "$rc" = 124 ]; then tmo=$((tmo+1)); echo "TIMEOUT $n (> ${TMO}s)";
    else fail=$((fail+1)); echo "FAIL $n (rc=$rc)"; echo "$out" | tail -2; fi
  fi
done
echo "== $pass pass, $fail fail, $tmo timeout"
# exit 1 on any mismatch, 2 when timeouts (or zero attempts) leave the
# certification incomplete — an all-timeout run must NOT read as a pass
if [ "$fail" != 0 ]; then exit 1; fi
if [ "$tmo" != 0 ] || [ "$pass" = 0 ]; then exit 2; fi
exit 0
