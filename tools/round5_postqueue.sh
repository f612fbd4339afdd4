#!/bin/bash
# Post-queue opportunistic TPU jobs: run only after the main round-5 TPU
# queue prints its DONE marker, and only if wall-clock remains. Currently:
# re-emit hbm_roofline.json with the two-point-slope HBM probe (VERDICT r4
# weak #3 / item 5) — both signatures it needs (per-step train_step, saxpy)
# are disk-cached, so this is minutes, and it cannot invalidate the default
# fused bench signature (XLA disk cache is add-only, keyed per program).
cd "$(dirname "$0")/.."
set -x
P=tools/parity
HARD_STOP=$(date -u -d '13:58' +%s)

while ! grep -q 'QUEUE_R5 TPU DONE' $P/round5_main.log 2>/dev/null; do
  [ "$(date -u +%s)" -ge "$HARD_STOP" ] && exit 0
  QPID=$(cat /tmp/r5_tpu_main.pid 2>/dev/null)
  if [ -n "$QPID" ] && ! ps -p "$QPID" > /dev/null 2>&1; then break; fi
  sleep 120
done

if [ "$(date -u +%s)" -lt "$HARD_STOP" ]; then
  CLIMATE_TPU_BENCH_ROOFLINE=1 CLIMATE_TPU_BENCH_FUSED=0 \
    timeout 1500 python bench.py --measure > $P/roofline_rerun_r5.log 2>&1 || true
  tail -2 $P/roofline_rerun_r5.log
  cat $P/hbm_roofline.json
fi
echo "POSTQUEUE_R5 DONE"
