#!/bin/bash
cd "$(dirname "$0")/.."
set -x
PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine" \
python tools/parity_run.py --stack jax --model cnn_transformer --pipeline ensemble --epochs 300 --tag cosine300
# profiler flag end-to-end: short flagship run with jax.profiler tracing on
python -m climate_tpu.cli.main data=data_final model=unet_convlstm_attention \
  trainer.max_epochs=2 data.seq_len=6 trainer.profile=true \
  output_dir=/root/repo/runs/profile_demo
echo "FINAL QUEUE2 DONE"
PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine" \
python tools/parity_run.py --stack jax --model unet_convlstm_attention --pipeline final --epochs 300 --seq-len 6 --tag cosine300
echo "FLAGSHIP300 DONE"
