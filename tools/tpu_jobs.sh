#!/bin/bash
# Remaining TPU jobs, serial.
cd "$(dirname "$0")/.."
set -x
python tools/parity_run.py --stack jax --model cnn_transformer --pipeline baseline --epochs 50
python tools/train_bench.py 127
PARITY_EXTRA_OVERRIDES="training.precision=bf16" \
python tools/parity_run.py --stack jax --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 6 --tag bf16
echo "TPU JOBS DONE"
