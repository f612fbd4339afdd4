#!/bin/bash
# Round-3 TPU queue #1: bench experiments (fused ConvLSTM kernel in-situ,
# large-batch MFU), closed-loop attack (self-forcing A/B with val-window
# closed-loop scoring), quality singles (wider/deeper cnn_transformer).
# Serial by design — one TPU client at a time (see verify SKILL.md).
cd "$(dirname "$0")/.."
set -x
W="tools/tpu_when_alive.sh"
RUNS=tools/parity/jax_runs
STATE=tools/parity/round3_queue_state.txt

newest_ckpt() { ls -td $RUNS/*/*/checkpoints 2>/dev/null | head -1; }

# --- 0a. fused ConvLSTM Pallas kernel in-situ (VERDICT r2 next #6) ---
if [ ! -f tools/parity/bench_fused_lstm_r3.log ]; then
  CLIMATE_TPU_CONVLSTM=fused bash $W python bench.py \
    > tools/parity/bench_fused_lstm_r3.log 2>&1 || true
  tail -1 tools/parity/bench_fused_lstm_r3.log
fi

# --- 0b. large-batch throughput mode (VERDICT r2 next #7): per-step path,
#         batch 256/512 bf16 — what the chip sustains when not latency-bound
for B in 256 512; do
  if [ ! -f tools/parity/bench_batch${B}_r3.log ]; then
    CLIMATE_TPU_BENCH_BATCH=$B CLIMATE_TPU_BENCH_FUSED=0 bash $W python bench.py \
      > tools/parity/bench_batch${B}_r3.log 2>&1 || true
    tail -1 tools/parity/bench_batch${B}_r3.log
  fi
done

# --- 1. feedback flagship e50 BASELINE (teacher-forced training) ---
if [ ! -f tools/parity/jax_unet_convlstm_attention_final_fbbase_e50.json ]; then
  PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr]" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag fbbase --save-preds
  echo "CKPT_A=$(newest_ckpt)/best" >> $STATE
fi
CKPT_A=$(grep CKPT_A $STATE | tail -1 | cut -d= -f2)

# --- 2. val-window closed-loop score, baseline ---
if [ ! -f tools/parity/rollout_valwin_base.log ]; then
  bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_A data=data_final \
    model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
    rollout.months=24 rollout.feedback=true \
    rollout.val_window=true rollout.seed_history=true \
    output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_base.log 2>&1 || true
fi
tail -3 tools/parity/rollout_valwin_base.log

# --- 3. self-forced flagship e50 (2-step rollout loss) ---
if [ ! -f tools/parity/jax_unet_convlstm_attention_final_fbselfforce_e50.json ]; then
  PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr] training.self_force_weight=0.5" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag fbselfforce --save-preds
  echo "CKPT_B=$(newest_ckpt)/best" >> $STATE
fi
CKPT_B=$(grep CKPT_B $STATE | tail -1 | cut -d= -f2)

# --- 4. val-window closed-loop score, self-forced ---
if [ ! -f tools/parity/rollout_valwin_selfforce.log ]; then
  bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_B data=data_final \
    model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
    rollout.months=24 rollout.feedback=true \
    rollout.val_window=true rollout.seed_history=true \
    output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_selfforce.log 2>&1 || true
fi
tail -3 tools/parity/rollout_valwin_selfforce.log

# --- 5. quality singles: wider/deeper cnn_transformer on the ensemble data ---
PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=46" \
  bash $W python tools/parity_run.py --stack jax --model cnn_transformer \
  --pipeline ensemble --epochs 300 \
  --model-kw '{"embed_dim": 256, "mlp_dim": 512, "depth": 6}' \
  --tag "cos300w256d6" --save-preds

PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=46" \
  bash $W python tools/parity_run.py --stack jax --model cnn_transformer \
  --pipeline ensemble --epochs 300 \
  --model-kw '{"embed_dim": 384, "mlp_dim": 768, "n_heads": 8}' \
  --tag "cos300w384" --save-preds

# --- 6. final bench re-warm for the driver's end-of-round run ---
bash $W python bench.py > tools/parity/bench_rewarm_r3.log 2>&1 || true
tail -1 tools/parity/bench_rewarm_r3.log

echo "ROUND3 QUEUE1 DONE"
