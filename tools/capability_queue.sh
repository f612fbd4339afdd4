#!/bin/bash
# Capability runs on TPU (serial): extended seq_len=12 and bf16 policy.
cd "$(dirname "$0")/.."
set -x
python tools/parity_run.py --stack jax --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 12 --tag seq12
PARITY_EXTRA_OVERRIDES="training.precision=bf16" \
python tools/parity_run.py --stack jax --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 6 --tag bf16
echo "CAPABILITY QUEUE DONE"
# re-run: the original TPU history of this run was overwritten by a CPU straggler
python tools/parity_run.py --stack jax --model cnn_transformer --pipeline baseline --epochs 50
echo "RERUN DONE"
