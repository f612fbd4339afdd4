#!/bin/bash
# Beyond-parity runs: cosine 150-epoch training for the remaining headline configs.
cd "$(dirname "$0")/.."
set -x
PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine" \
python tools/parity_run.py --stack jax --model cnn_transformer --pipeline ensemble --epochs 150 --tag cosine
PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine" \
python tools/parity_run.py --stack jax --model unet_convlstm_attention --pipeline final --epochs 150 --seq-len 12 --tag seq12cosine
PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine" \
python tools/parity_run.py --stack jax --model unet --pipeline baseline --epochs 150 --tag cosine
echo "BEYOND QUEUE DONE"
