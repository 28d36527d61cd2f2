#!/bin/bash
# Per-query timeout wrapper around check.py, for engine-inflated scale
# runs where a single mis-scaled oracle must not hang the whole pass.
# Usage: tools/check_batch.sh <sfDir> <verifyOutDir> [timeoutSec] [excludeCsv] [bandedCsv]
# excludeCsv: comma-separated names DELIBERATELY left out of this
# certification (e.g. quadratic oracle twins at scale) — reported as
# "excluded (declared)" and exempt from the skip gate below; anything
# else missing its Spark output still fails the run.
# bandedCsv (r14 ask #4): comma-separated name:twin pairs certified via a
# bounded subset twin (check.py --banded) instead of the entry's own
# quadratic oracle — attempted and counted, not excluded.
set -uo pipefail
cd "$(dirname "$0")/.."
# Round-8 postmortem: DuckDB spill left behind by killed/timed-out oracle
# processes filled the disk (~80 GB) and zeroed the round's driver run.
# check.py pins spill (20 GB cap) under a PER-RUN subdirectory so a
# concurrent cert + scale probe cannot delete each other's live spill;
# the trap removes only THIS run's directory.
# Owner-only trap: remove THIS run's spill dir and nothing else — a
# shared glob here would delete a concurrent run's live spill mid-oracle.
export GRAFT_SPILL_DIR="$PWD/.tmp/duckdb_spill.$$"
trap 'rm -rf "$GRAFT_SPILL_DIR"' EXIT
SF="$1"; OUT="$2"; TMO="${3:-240}"; EXCL=",${4:-},"; BANDED=",${5:-},"
NAMES=$(python3 -c "import json;print(' '.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")
pass=0; fail=0; tmo=0; skipped=0; excluded=0
for n in $NAMES; do
  case "$EXCL" in *",$n,"*) excluded=$((excluded+1)); echo "EXCLUDED $n (declared)"; continue;; esac
  case "$BANDED" in *",$n:"*)
    twin=$(echo "$BANDED" | sed "s/.*,$n:\([^,]*\),.*/\1/")
    if [ ! -d "$OUT/$n" ]; then skipped=$((skipped+1)); echo "SKIP $n (no spark output)"; continue; fi
    if out=$(timeout -k 10 "$TMO" python3 tools/check.py "$SF" "$OUT" --banded "$n" "$twin" 2>&1); then
      pass=$((pass+1)); echo "$out" | grep "^PASS"
    else
      rc=$?
      if [ "$rc" = 124 ]; then tmo=$((tmo+1)); echo "TIMEOUT $n (banded, > ${TMO}s)";
      else fail=$((fail+1)); echo "$out" | tail -4; fi
    fi
    continue;;
  esac
  # an oracle entry with no Spark output directory is a SKIP, not a free
  # pass: count it and fail the certification below (a run where Verify
  # produced nothing must not read as green)
  if [ ! -d "$OUT/$n" ]; then skipped=$((skipped+1)); echo "SKIP $n (no spark output)"; continue; fi
  if out=$(timeout -k 10 "$TMO" python3 tools/check.py "$SF" "$OUT" "$n" 2>&1); then
    if echo "$out" | grep -q "^PASS"; then pass=$((pass+1)); else
      fail=$((fail+1)); echo "$out" | grep -v "^== "; fi
  else
    rc=$?
    if [ "$rc" = 124 ]; then tmo=$((tmo+1)); echo "TIMEOUT $n (> ${TMO}s)";
    else fail=$((fail+1)); echo "FAIL $n (rc=$rc)"; echo "$out" | tail -2; fi
  fi
done
# ln-ulp parity guard (r10 verdict ask #2): the entries keying on
# round(ln(integer)*1e6) must have NO argument near a .5 rounding
# boundary at THIS data scale — exposure grows with corpus size, so the
# x10/x20 certifications exercise it on the inflated data. Same timeout
# discipline as the oracles: a mis-scaled guard query must not hang the
# pass (it inherits this run's GRAFT_SPILL_DIR, so its spill is capped
# and cleaned by our trap). -k 10: Python only delivers TERM between
# bytecodes, so a guard/oracle stuck inside a native duckdb execute
# ignores the soft TERM — escalate to SIGKILL 10 s later (the trap and
# sweep still clean the spill dir).
if ! timeout -k 10 $((TMO * 3)) python3 tools/ln_guard.py "$SF"; then
  fail=$((fail+1)); echo "FAIL ln_guard"
fi
echo "== $pass pass, $fail fail, $tmo timeout, $skipped skipped, $excluded excluded"
# exit 1 on any mismatch, 2 when timeouts/skips (or zero attempts) leave
# the certification incomplete — an all-timeout or outputs-missing run
# must NOT read as a pass
if [ "$fail" != 0 ]; then exit 1; fi
if [ "$tmo" != 0 ] || [ "$skipped" != 0 ] || [ "$pass" = 0 ]; then exit 2; fi
exit 0
