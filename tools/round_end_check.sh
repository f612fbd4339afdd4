#!/usr/bin/env bash
# Round-end gate (VERDICT r4 item 8): verify the two driver-visible artifacts
# work BEFORE the round closes:
#   1. `python bench.py` emits a parseable JSON line with value != null
#   2. `dryrun_multichip(8)` compiles + executes on a virtual CPU mesh
# Run this as the LAST job of every round, after the compile-cache rewarm.
set -u
cd "$(dirname "$0")/.."

echo "== round_end_check $(date -u +%FT%TZ) =="

echo "-- bench.py (budget-bounded) --"
BENCH_OUT=$(timeout 900 python bench.py 2>/dev/null | tail -1)
echo "$BENCH_OUT"
python - "$BENCH_OUT" <<'EOF'
import json, sys
obj = json.loads(sys.argv[1])
assert obj.get("value") is not None, f"bench value is null: {obj}"
print(f"bench OK: {obj['value']} {obj.get('unit')}" + (" [STALE]" if obj.get("stale") else ""))
EOF
BENCH_RC=$?

echo "-- dryrun_multichip(8) on virtual CPU mesh --"
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 900 python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('multichip OK')"
MC_RC=$?

if [ "$BENCH_RC" -eq 0 ] && [ "$MC_RC" -eq 0 ]; then
  echo "ROUND_END_CHECK: PASS"
else
  echo "ROUND_END_CHECK: FAIL (bench=$BENCH_RC multichip=$MC_RC)"
  exit 1
fi
