#!/bin/bash
# Round-5 TPU queue 2: rebuild the closed-loop member pool. The round
# boundary wiped tools/parity/jax_runs/ (gitignored), so every round-3/4
# feedback checkpoint (fbchain2 s42/s43, ss25) is gone — only valpreds/
# histories survive. The multi-member vmap trainer retrains the whole pool
# in ONE run. Waits for round5_tpu_queue.sh to drain first (serial TPU use).
cd "$(dirname "$0")/.."
set -x
W="tools/tpu_when_alive.sh"
P=tools/parity
RUNS=$P/jax_runs
STATE=$P/round5_queue_state.txt

# --- 0. wait for queue 1 (marker, or its shell gone) ---
while ! grep -q 'QUEUE_R5 TPU DONE' $P/round5_queue.log 2>/dev/null; do
  QPID=$(cat /tmp/r5_tpu_queue.pid 2>/dev/null)
  if [ -n "$QPID" ] && ! ps -p "$QPID" > /dev/null 2>&1; then break; fi
  sleep 120
done

# --- 1. fbchain2 member pool: K=4 vmapped (seeds 42,43,45,46; 44 is queue-1
#        solo) — one compile, 4 members, per-member ckpts + valpreds ---
if [ ! -f $P/jax_unet_convlstm_attention_final_mm4fb_e50.json ]; then
  PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr] training.self_force_weight=0.5 training.self_force_steps=2 training.prev_noise=0.05" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag mm4fb --save-preds \
    --members 4 --member-seeds 42,43,45,46
  MMDIR=$(ls -td $RUNS/*/* 2>/dev/null | head -1)
  for K in 0 1 2 3; do
    echo "CKPT_FB$K=$MMDIR/member$K/checkpoints/best" >> $STATE
  done
fi

# --- 2. scheduled-sampling member (separate signature: ss ramp) ---
if [ ! -f $P/jax_unet_convlstm_attention_final_ss25r5_e50.json ]; then
  PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr] training.self_force_weight=0.5 training.self_force_steps=2 training.prev_noise=0.05 training.sched_sampling_epochs=25 training.sched_sampling_max=1.0 training.fit_calibration=true" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag ss25r5 --save-preds
  echo "CKPT_SS=$(ls -td $RUNS/*/*/checkpoints 2>/dev/null | head -1)/best" >> $STATE
fi

echo "QUEUE_R5 TPU2 DONE"
