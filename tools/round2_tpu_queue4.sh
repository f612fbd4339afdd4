#!/bin/bash
# Round-2 TPU queue, take 3: the window-gather kernel's mosaic tiling bug is
# fixed (block view (1, HWC/128, 128)) and validated bit-exact on the chip.
# Order: bf16 e50 (VERDICT item 1) -> bench.py cache warm -> MFU breakdowns
# -> kernel bench -> feedback e50 -> 3-seed ensemble -> fused-compile probe.
cd "$(dirname "$0")/.."
set -x

PARITY_EXTRA_OVERRIDES="training.precision=bf16 trainer.fuse_epoch=false" \
  bash tools/tpu_when_alive.sh python tools/parity_run.py --stack jax \
  --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 6 --tag bf16

bash tools/tpu_when_alive.sh timeout 7200 python bench.py \
  > /tmp/bench_warm.json 2>/tmp/bench_warm.err

bash tools/tpu_when_alive.sh timeout 3600 python tools/step_breakdown.py --precision fp32 \
  > tools/parity/step_breakdown_fp32.json 2>/tmp/step_breakdown_fp32.err
bash tools/tpu_when_alive.sh timeout 3600 python tools/step_breakdown.py --precision bf16 \
  > tools/parity/step_breakdown_bf16.json 2>/tmp/step_breakdown_bf16.err

bash tools/tpu_when_alive.sh timeout 2400 python tools/kernel_bench.py \
  > tools/parity/kernel_bench_r2.txt 2>&1

PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr]" \
  bash tools/tpu_when_alive.sh python tools/parity_run.py --stack jax \
  --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 6 \
  --tag feedback --save-preds

for SEED in 42 43 44; do
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=${SEED}" \
    bash tools/tpu_when_alive.sh python tools/parity_run.py --stack jax \
    --model cnn_transformer --pipeline ensemble --epochs 300 \
    --tag "cos300seed${SEED}" --save-preds
done
python tools/ensemble_eval.py tools/parity/jax_cnn_transformer_ensemble_cos300seed*_valpreds.npz \
  > tools/parity/ensemble_cnn_t_cos300.json 2>/tmp/ensemble_eval.err

bash tools/tpu_when_alive.sh timeout 10800 python tools/bf16_probe.py --stage epoch \
  > /tmp/bf16_fused_compile.log 2>&1

echo "ROUND2 TPU QUEUE4 DONE"

# --- appended: rerun breakdowns with slice-sync timed() (full-array host
# pulls were timing the tunnel, not the kernels; full-step numbers were valid)
bash tools/tpu_when_alive.sh timeout 3600 python tools/step_breakdown.py --precision fp32 \
  > tools/parity/step_breakdown_fp32.json 2>/tmp/step_breakdown_fp32.err
bash tools/tpu_when_alive.sh timeout 3600 python tools/step_breakdown.py --precision bf16 \
  > tools/parity/step_breakdown_bf16.json 2>/tmp/step_breakdown_bf16.err
echo "ROUND2 TPU QUEUE4 APPENDED DONE"
bash tools/tpu_when_alive.sh timeout 3600 python bench.py \
  > /tmp/bench_warm2.json 2>/tmp/bench_warm2.err
echo "BENCH RERUN DONE"
# split-lstm full-step measurement (fp32 + bf16) — decides the dispatch default
bash tools/tpu_when_alive.sh timeout 3600 python tools/step_breakdown.py --precision fp32 --split-lstm \
  > tools/parity/step_breakdown_fp32_splitlstm.json 2>/tmp/sb_fp32_split.err
bash tools/tpu_when_alive.sh timeout 3600 python tools/step_breakdown.py --precision bf16 --split-lstm \
  > tools/parity/step_breakdown_bf16_splitlstm.json 2>/tmp/sb_bf16_split.err
echo "SPLIT LSTM MEASURE DONE"
