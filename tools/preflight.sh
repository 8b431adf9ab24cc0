#!/usr/bin/env bash
# End-of-round pre-flight: run this after ANY fixture refresh or before
# handing the repo to the driver. Round 4 shipped a broken contract
# because nothing re-ran after /root/testdata was regenerated; this is
# the 10-minute ritual that catches that class of drift.
#
#   bash tools/preflight.sh            # full: pytest + gate + bench + plans
#   bash tools/preflight.sh --fast     # skip pytest (gate + bench + plans)
#
# Exits non-zero if any stage fails. Log to PROGRESS/console as you like:
#   bash tools/preflight.sh 2>&1 | tail -30
set -uo pipefail
cd "$(dirname "$0")/.."

FAST=0
[ "${1:-}" = "--fast" ] && FAST=1
rc=0

echo "== preflight: $(date -u +%FT%TZ) =="

if [ "$FAST" = 0 ]; then
  echo "-- [1/4] pytest"
  python -m pytest tests/ -x -q 2>&1 | tail -3 || rc=1
else
  echo "-- [1/4] pytest SKIPPED (--fast)"
fi

echo "-- [2/4] vanilla oracle gate (all queries, sf0.01)"
GATE_OUT=$(python tools/check_correctness.py --vanilla /root/testdata/sf0.01 2>&1 \
  | grep -vE "WARN|INFO|log4j|setLogLevel|^\[Stage|Using|NativeCodeLoader")
echo "$GATE_OUT" | tail -5
echo "$GATE_OUT" | grep -qE ", 0 fail," || { echo "GATE FAILED"; rc=1; }

echo "-- [3/4] PLANS.md regen + coverage gate"
# regen is part of the ritual (VERDICT r7 #4: PLANS.md trailed the
# last commit twice) — every queries() entry must have a plan row
python tools/plan_report.py 2>/dev/null | tail -2 || rc=1
python - <<'EOF' || rc=1
import re, sys
sys.path.insert(0, ".")
import __spark_entry__ as em
names = set(em.queries().keys())
plans = {
    m.group(1)
    for m in re.finditer(r"^\| (\S+) \|", open("PLANS.md").read(), re.M)
}
missing = names - plans
assert not missing, f"PLANS.md missing rows for: {sorted(missing)}"
print(f"PLANS.md covers all {len(names)} contract queries")
EOF

echo "-- [4/4] bench (sf0.1)"
BENCH_OUT=$(python bench.py 2>/dev/null)
echo "$BENCH_OUT"
python - "$BENCH_OUT" <<'EOF' || rc=1
import json, sys
j = json.loads(sys.argv[1])
assert j.get("value") and j["queries"], "bench produced no timings"
if j.get("failures"):
    print("BENCH HAS FAILURES:", list(j["failures"]))
    sys.exit(1)
print(f"bench OK: {j['value']}s over {len(j['queries'])} queries")
EOF

echo "== preflight rc=$rc =="
exit $rc
