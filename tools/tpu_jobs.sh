#!/bin/bash
# TPU jobs, serial: train-mode bench + parity reruns with torch-default init.
# bf16 flagship training is EXCLUDED: its XLA/Mosaic compile hangs >45min on
# this axon stack (2 attempts, 2026-08-16); bf16 numerics are covered by
# tests/test_eval_extras.py::TestBf16Policy on CPU.
cd "$(dirname "$0")/.."
set -x
python tools/train_bench.py 126
python tools/parity_run.py --stack jax --model cnn_transformer --pipeline baseline --epochs 50
python tools/parity_run.py --stack jax --model unet --pipeline baseline --epochs 50
python tools/parity_run.py --stack jax --model SimpleCNN --pipeline baseline --epochs 50
python tools/parity_run.py --stack jax --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 6
python tools/parity_run.py --stack jax --model cnn_transformer --pipeline ensemble --epochs 50
python tools/parity_run.py --stack jax --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 12 --tag seq12
echo "TPU JOBS DONE"
python tools/train_bench.py 126
echo TRAIN_BENCH2_DONE
