#!/bin/bash
cd "$(dirname "$0")/.."
set -x
PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine" \
python tools/parity_run.py --stack jax --model SimpleCNN --pipeline baseline --epochs 150 --tag cosine
echo "FINAL QUEUE DONE"
