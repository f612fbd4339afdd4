#!/bin/bash
# Serialized parity runs. JAX runs use the TPU (ambient axon platform) — one
# client at a time, each exits on its own (NEVER kill a TPU client mid-step).
cd "$(dirname "$0")/.."
set -x
# --- jax stack on TPU: full 50-epoch headline configs ---
python tools/parity_run.py --stack jax --model cnn_transformer --pipeline baseline --epochs 50
python tools/parity_run.py --stack jax --model unet --pipeline baseline --epochs 50
python tools/parity_run.py --stack jax --model SimpleCNN --pipeline baseline --epochs 50
python tools/parity_run.py --stack jax --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 6
python tools/parity_run.py --stack jax --model cnn_transformer --pipeline ensemble --epochs 50
echo "JAX PARITY RUNS DONE"
# --- torch stack on CPU: epoch-bounded (full length infeasible on 1 core) ---
python tools/parity_run.py --stack torch --model cnn_transformer --pipeline baseline --epochs 12
python tools/parity_run.py --stack torch --model unet --pipeline baseline --epochs 12
python tools/parity_run.py --stack torch --model unet_convlstm_attention --pipeline final --epochs 4 --seq-len 6
python tools/parity_run.py --stack torch --model SimpleCNN --pipeline baseline --epochs 1
echo "PARITY QUEUE DONE"
