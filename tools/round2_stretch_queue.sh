#!/bin/bash
# Round-2 stretch: beyond-parity quality push (VERDICT item 10).
# 3-seed flagship (final pipeline, cosine e300) ensemble — best single run is
# composite 0.70; mean-of-members targets lower. Waits for queue4 (PID $1).
cd "$(dirname "$0")/.."
set -x

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 120; done
  echo "[stretch] queue4 (pid $WAIT_PID) finished at $(date)"
fi

for SEED in 42 43 44; do
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=${SEED}" \
    bash tools/tpu_when_alive.sh python tools/parity_run.py --stack jax \
    --model unet_convlstm_attention --pipeline final --epochs 300 --seq-len 6 \
    --tag "cos300seed${SEED}" --save-preds
done
python tools/ensemble_eval.py tools/parity/jax_unet_convlstm_attention_final_cos300seed*_valpreds.npz \
  > tools/parity/ensemble_flagship_cos300.json 2>/tmp/ensemble_flagship.err

echo "ROUND2 STRETCH QUEUE DONE"

# --- appended: deferred fused-epoch bf16 compile probe (moved behind the
# quality runs; cache population is the least time-critical TPU job)
rm -f /tmp/skip_bf16_epoch_probe
bash tools/tpu_when_alive.sh timeout 10800 python tools/bf16_probe.py --stage epoch \
  > /tmp/bf16_fused_compile.log 2>&1
echo "DEFERRED PROBE DONE"
# retry the bf16 split-lstm measure (TPU worker restart ate the first attempt)
bash tools/tpu_when_alive.sh timeout 3600 python tools/step_breakdown.py --precision bf16 --split-lstm \
  > tools/parity/step_breakdown_bf16_splitlstm.json 2>/tmp/sb_bf16_split.err
echo "BF16 SPLIT RETRY DONE"
