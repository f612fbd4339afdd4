#!/bin/bash
# Round-2 full-length torch anchors (VERDICT item 2): reference recipe
# (50 epochs, Adam lr 5e-4, batch 64, fp32) on the baseline/final splits.
# Serialized, nice'd: single-core host, foreground work gets priority.
# parity_run.py writes JSON per epoch, so partial progress persists.
cd "$(dirname "$0")/.."
set -x
nice -n 19 python tools/parity_run.py --stack torch --model unet --pipeline baseline --epochs 50
nice -n 19 python tools/parity_run.py --stack torch --model cnn_transformer --pipeline baseline --epochs 50
nice -n 19 python tools/parity_run.py --stack torch --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 6
echo "TORCH ANCHOR QUEUE DONE"
