#!/bin/bash
# Round-5 TPU queue. Ordering per VERDICT r4 item 8: driver-visible artifacts
# FIRST (bench rewarm + fresh number) and LAST (re-warm + round_end_check);
# experiments in the middle. Every job is idempotent (output-file skip-guards)
# so the queue survives axon outages/restarts.
#
# NOTE: the terminal restarted before round 5 (CPU features changed, XLA
# compile cache invalidated) — every signature recompiles once (~10-20 min).
# The remote compile helper was seen SIGKILLed (OOM) once on the fused-epoch
# program; rewarm retries up to 3x.
cd "$(dirname "$0")/.."
set -x
W="tools/tpu_when_alive.sh"
P=tools/parity
RUNS=$P/jax_runs
STATE=$P/round5_queue_state.txt

newest_ckpt() { ls -td $RUNS/*/*/checkpoints 2>/dev/null | head -1; }
ckpt() { grep "^$1=" $STATE 2>/dev/null | tail -1 | cut -d= -f2; }

# --- 1. rewarm the DEFAULT bench signature (driver-visible artifact #1) ---
for ATTEMPT in 1 2 3; do
  if [ -f $P/round5_rewarm_ok ]; then break; fi
  if bash $W timeout 3000 python bench.py --measure > $P/bench_rewarm_r5.log 2>&1; then
    grep -q samples_per_sec $P/bench_rewarm_r5.log && touch $P/round5_rewarm_ok
  fi
  sleep 60
done
# fresh driver-format number (bounded; falls back to stale cache if the TPU
# wedges — but after the rewarm above this should be a live measurement)
if [ -f $P/round5_rewarm_ok ] && [ ! -f $P/bench_r5_first.json ]; then
  timeout 900 python bench.py > $P/bench_r5_first.json 2>/dev/null
  cat $P/bench_r5_first.json
fi

# --- 2. multi-member vmap bench rows (K=4, 8): aggregate samples/s ---
for K in 4 8; do
  if [ ! -f $P/bench_members${K}_r5.json ]; then
    CLIMATE_TPU_BENCH_MEMBERS=$K bash $W timeout 3000 python bench.py --measure \
      > $P/bench_members${K}_r5.json 2> $P/bench_members${K}_r5.err || true
    tail -1 $P/bench_members${K}_r5.json
  fi
done

# --- 3. finish fbchain2s44 (round-4 queue died at its epoch 24) ---
if [ ! -f $P/jax_unet_convlstm_attention_final_fbchain2s44_e50_valpreds.npz ]; then
  rm -f $P/jax_unet_convlstm_attention_final_fbchain2s44_e50.json
  PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr] training.self_force_weight=0.5 training.self_force_steps=2 training.prev_noise=0.05 training.fit_calibration=true seed=44" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag fbchain2s44 --save-preds
  echo "CKPT_S44=$(newest_ckpt)/best" >> $STATE
fi

# --- 4. multi-member K=4 flagship training (one vmapped run = 4 members) ---
if [ ! -f $P/jax_unet_convlstm_attention_final_mm4_e50.json ]; then
  bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag mm4 --save-preds \
    --members 4 --member-seeds 50,51,52,53
  echo "CKPT_MM4=$(ls -td $RUNS/*/* 2>/dev/null | head -1)" >> $STATE
fi

# --- 5. multi-member K=4 cnn_transformer cos300 members (stack fodder) ---
if [ ! -f $P/jax_cnn_transformer_ensemble_mm4cos300_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine training.warmup_steps=500" \
    bash $W python tools/parity_run.py --stack jax --model cnn_transformer \
    --pipeline ensemble --epochs 300 --tag mm4cos300 --save-preds \
    --members 4 --member-seeds 45,46,47,48
fi

# --- 6. UNet endpoint-gap seeds (VERDICT r4 missing #5) ---
for SD in 43 44; do
  if [ ! -f $P/jax_unet_baseline_s${SD}_e50.json ]; then
    PARITY_EXTRA_OVERRIDES="seed=${SD}" \
      bash $W python tools/parity_run.py --stack jax --model unet \
      --pipeline baseline --epochs 50 --tag s${SD}
  fi
done

# --- 7. LAST: re-warm default signature + stable driver bench + gate ---
rm -f $P/round5_rewarm_ok
for ATTEMPT in 1 2 3; do
  if [ -f $P/round5_rewarm_ok ]; then break; fi
  if bash $W timeout 3000 python bench.py --measure > $P/bench_rewarm_r5_final.log 2>&1; then
    grep -q samples_per_sec $P/bench_rewarm_r5_final.log && touch $P/round5_rewarm_ok
  fi
  sleep 60
done
timeout 900 python bench.py > $P/bench_r5_final1.json 2>/dev/null; cat $P/bench_r5_final1.json
timeout 900 python bench.py > $P/bench_r5_final2.json 2>/dev/null; cat $P/bench_r5_final2.json
bash tools/round_end_check.sh > $P/round5_end_check.log 2>&1 || true
tail -3 $P/round5_end_check.log
echo "QUEUE_R5 TPU DONE"
