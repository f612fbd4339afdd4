#!/bin/bash
# Round-2 TPU queue, reordered continuation: waits for the in-flight bf16 e50
# run (PID $1), then warms the bench.py bf16 compile cache FIRST (so the
# driver's end-of-round bench.py hits the persistent cache), then MFU
# breakdowns, kernel bench, feedback run, seed ensemble, fused-compile probe.
cd "$(dirname "$0")/.."
set -x

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "[queue3] prior run (pid $WAIT_PID) finished at $(date)"
fi

# 1. Warm bench.py's bf16 compile into the persistent cache + record the number.
bash tools/tpu_when_alive.sh timeout 7200 python bench.py \
  > /tmp/bench_warm.json 2>/tmp/bench_warm.err

# 2. Step-time breakdown + MFU, fp32 then bf16 (VERDICT item 6).
bash tools/tpu_when_alive.sh timeout 3600 python tools/step_breakdown.py --precision fp32 \
  > tools/parity/step_breakdown_fp32.json 2>/tmp/step_breakdown_fp32.err
bash tools/tpu_when_alive.sh timeout 3600 python tools/step_breakdown.py --precision bf16 \
  > tools/parity/step_breakdown_bf16.json 2>/tmp/step_breakdown_bf16.err

# 3. Kernel microbench: window-gather pallas vs XLA at production shapes.
bash tools/tpu_when_alive.sh timeout 1800 python tools/kernel_bench.py \
  > tools/parity/kernel_bench_r2.txt 2>&1

# 4. Feedback-trained flagship (data.feedback_vars): e50 demo checkpoint for
#    the autoregressive rollout CLI.
PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr]" \
  bash tools/tpu_when_alive.sh python tools/parity_run.py --stack jax \
  --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 6 \
  --tag feedback --save-preds

# 5. Seed ensemble: 3x cnn_transformer/ensemble cosine e300 with saved val
#    predictions (round-1 best single composite 0.60; target <0.55 ensembled).
for SEED in 42 43 44; do
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=${SEED}" \
    bash tools/tpu_when_alive.sh python tools/parity_run.py --stack jax \
    --model cnn_transformer --pipeline ensemble --epochs 300 \
    --tag "cos300seed${SEED}" --save-preds
done
python tools/ensemble_eval.py tools/parity/jax_cnn_transformer_ensemble_cos300seed*_valpreds.npz \
  > tools/parity/ensemble_cnn_t_cos300.json 2>/tmp/ensemble_eval.err

# 6. Fused-epoch bf16 compile attempt (cache population; generous budget).
bash tools/tpu_when_alive.sh timeout 10800 python tools/bf16_probe.py --stage epoch \
  > /tmp/bf16_fused_compile.log 2>&1

echo "ROUND2 TPU QUEUE3 DONE"
