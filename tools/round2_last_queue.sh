#!/bin/bash
# Last TPU slot of round 2: seq12 flagship at the reference recipe with the
# Pallas window-gather live in the hot path (in-situ kernel evidence vs the
# round-1 seq12 run's 2341 samples/s), then an even wider transformer member.
cd "$(dirname "$0")/.."
set -x

bash tools/tpu_when_alive.sh python tools/parity_run.py --stack jax \
  --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 12 \
  --tag pallas12

PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=46" \
  bash tools/tpu_when_alive.sh python tools/parity_run.py --stack jax \
  --model cnn_transformer --pipeline ensemble --epochs 300 \
  --model-kw '{"embed_dim": 256, "mlp_dim": 512}' \
  --tag "cos300wide256" --save-preds

echo "ROUND2 LAST QUEUE DONE"
