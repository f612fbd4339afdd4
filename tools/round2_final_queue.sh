#!/bin/bash
# Round-2 final TPU queue: a wider cnn_transformer as a decorrelated 4th
# ensemble member (beyond-parity push), then the deferred fused-compile probe
# truly last. Waits for the stretch queue (PID $1).
cd "$(dirname "$0")/.."
set -x

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 120; done
  echo "[final] stretch queue (pid $WAIT_PID) finished at $(date)"
fi

# wider transformer: embed 192 / mlp 384 (vs 128/256) — different capacity
# decorrelates errors from the 3 seed members
PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=45" \
  bash tools/tpu_when_alive.sh python tools/parity_run.py --stack jax \
  --model cnn_transformer --pipeline ensemble --epochs 300 \
  --model-kw '{"embed_dim": 192, "mlp_dim": 384}' \
  --tag "cos300wide" --save-preds

python tools/ensemble_eval.py \
  tools/parity/jax_cnn_transformer_ensemble_cos300seed*_valpreds.npz \
  tools/parity/jax_cnn_transformer_ensemble_cos300wide_e300_valpreds.npz \
  > tools/parity/ensemble_cnn_t_cos300w.json 2>/tmp/ensemble_eval_w.err

rm -f /tmp/skip_bf16_epoch_probe /tmp/skip_bf16_epoch_probe2
bash tools/tpu_when_alive.sh timeout 10800 python tools/bf16_probe.py --stage epoch \
  > /tmp/bf16_fused_compile.log 2>&1

echo "ROUND2 FINAL QUEUE DONE"
