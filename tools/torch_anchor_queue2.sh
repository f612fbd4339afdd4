#!/bin/bash
# Restarted torch anchor queue (machine restart killed the original at
# cnn_transformer epoch 3). unet e50 already complete — skip it.
cd "$(dirname "$0")/.."
set -x
nice -n 19 python tools/parity_run.py --stack torch --model cnn_transformer --pipeline baseline --epochs 50
nice -n 19 python tools/parity_run.py --stack torch --model unet_convlstm_attention --pipeline final --epochs 50 --seq-len 6
echo "TORCH ANCHOR QUEUE2 DONE"
