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

# ===== appended round-3 extensions (run after the base queue) =====

# --- 7. fused ConvLSTM kernel in-situ, PER-STEP path (the whole-epoch scan
#         with the kernel inside OOM-killed the remote compiler — recorded;
#         per-step is the honest in-situ comparison vs per-step XLA 5427)
if [ ! -f tools/parity/bench_fused_lstm_perstep_r3.log ]; then
  CLIMATE_TPU_CONVLSTM=fused CLIMATE_TPU_BENCH_FUSED=0 bash $W python bench.py \
    > tools/parity/bench_fused_lstm_perstep_r3.log 2>&1 || true
  tail -1 tools/parity/bench_fused_lstm_perstep_r3.log
fi
if [ ! -f tools/parity/bench_xla_perstep_r3.log ]; then
  CLIMATE_TPU_BENCH_FUSED=0 bash $W python bench.py \
    > tools/parity/bench_xla_perstep_r3.log 2>&1 || true
  tail -1 tools/parity/bench_xla_perstep_r3.log
fi

# --- 8. moment-loss quality A/B: wide256 cnn_transformer e300 with the
#         batch-moment map-matching loss (vs cos300wide256 = 0.5862 final)
if [ ! -f tools/parity/jax_cnn_transformer_ensemble_mm300w256_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=45 training.moment_loss_weight=1.0" \
    bash $W python tools/parity_run.py --stack jax --model cnn_transformer \
    --pipeline ensemble --epochs 300 \
    --model-kw '{"embed_dim": 256, "mlp_dim": 512}' \
    --tag "mm300w256" --save-preds
fi

# --- 9. long-horizon wide single: e600 cosine (quality ceiling probe)
if [ ! -f tools/parity/jax_cnn_transformer_ensemble_cos600w256_e600.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=47" \
    bash $W python tools/parity_run.py --stack jax --model cnn_transformer \
    --pipeline ensemble --epochs 600 \
    --model-kw '{"embed_dim": 256, "mlp_dim": 512}' \
    --tag "cos600w256" --save-preds
fi

# --- 10. final re-warm so the driver's bench.py hits a warm cache
bash $W python bench.py > tools/parity/bench_rewarm2_r3.log 2>&1 || true
tail -1 tools/parity/bench_rewarm2_r3.log
echo "ROUND3 QUEUE1 EXTENSIONS DONE"

# --- 11. slice-gather in-situ A/B (contiguous slice-size-T window gather
#         over a once-padded split vs the B*T row gather + mask; the gather
#         stage is 1.75 ms of the 10.9 ms bf16 step). New compiles (~20-40
#         min each, cached for the flip if it wins).
if [ ! -f tools/parity/bench_slice_fused_r3.log ]; then
  CLIMATE_TPU_BENCH_GATHER=slice bash $W python bench.py \
    > tools/parity/bench_slice_fused_r3.log 2>&1 || true
  tail -1 tools/parity/bench_slice_fused_r3.log
fi
if [ ! -f tools/parity/bench_slice_perstep_r3.log ]; then
  CLIMATE_TPU_BENCH_GATHER=slice CLIMATE_TPU_BENCH_FUSED=0 bash $W python bench.py \
    > tools/parity/bench_slice_perstep_r3.log 2>&1 || true
  tail -1 tools/parity/bench_slice_perstep_r3.log
fi
echo "ROUND3 QUEUE1 SLICE AB DONE"

# --- 12. train-fitted calibration member (training.fit_calibration=true):
#         alphas fit on the TRAIN split only (no val leakage), stored in
#         checkpoint meta; also a 6th ensemble member (seed 48)
if [ ! -f tools/parity/jax_cnn_transformer_ensemble_calib300w256_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=48 training.fit_calibration=true" \
    bash $W python tools/parity_run.py --stack jax --model cnn_transformer \
    --pipeline ensemble --epochs 300 \
    --model-kw '{"embed_dim": 256, "mlp_dim": 512}' \
    --tag "calib300w256" --save-preds
  echo "CKPT_CALIB=$(newest_ckpt)/best" >> $STATE
fi
echo "ROUND3 QUEUE1 CALIB DONE"
# ===== appended: chained self-forcing + calibrated closed-loop (round-3) =====
# Appended onto the RUNNING queue via `cat >>` (same inode — see NOTES_ROUND3.md
# hazard list). Targets VERDICT r2 next #3: closed-loop val window < 0.9.

# --- 13. chained self-forcing flagship e50 (k=2 + prev-noise), calibration
#         alphas fit on the TRAIN split and stored in checkpoint meta
if [ ! -f tools/parity/jax_unet_convlstm_attention_final_fbchain2_e50.json ]; then
  PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr] training.self_force_weight=0.5 training.self_force_steps=2 training.prev_noise=0.05 training.fit_calibration=true" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag fbchain2 --save-preds
  echo "CKPT_C=$(newest_ckpt)/best" >> $STATE
fi
CKPT_C=$(grep CKPT_C $STATE | tail -1 | cut -d= -f2)

# --- 14. val-window closed-loop, raw and calibrated scoring (same checkpoint;
#         rollout.calibrate applies meta['calibration'] to the scored copy only)
if [ ! -f tools/parity/rollout_valwin_fbchain2.log ]; then
  bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_C data=data_final \
    model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
    rollout.months=24 rollout.feedback=true \
    rollout.val_window=true rollout.seed_history=true \
    output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_fbchain2.log 2>&1 || true
  tail -2 tools/parity/rollout_valwin_fbchain2.log
fi
if [ ! -f tools/parity/rollout_valwin_fbchain2_calib.log ]; then
  bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_C data=data_final \
    model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
    rollout.months=24 rollout.feedback=true rollout.calibrate=true \
    rollout.val_window=true rollout.seed_history=true \
    output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_fbchain2_calib.log 2>&1 || true
  tail -2 tools/parity/rollout_valwin_fbchain2_calib.log
fi

# --- 15. prev-noise-only ablation e50 + closed-loop (separates "robust to
#         imperfect history" from "trained on own rollout")
if [ ! -f tools/parity/jax_unet_convlstm_attention_final_fbnoise_e50.json ]; then
  PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr] training.prev_noise=0.1" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag fbnoise --save-preds
  echo "CKPT_D=$(newest_ckpt)/best" >> $STATE
fi
CKPT_D=$(grep CKPT_D $STATE | tail -1 | cut -d= -f2)
if [ ! -f tools/parity/rollout_valwin_fbnoise.log ]; then
  bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_D data=data_final \
    model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
    rollout.months=24 rollout.feedback=true \
    rollout.val_window=true rollout.seed_history=true \
    output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_fbnoise.log 2>&1 || true
  tail -2 tools/parity/rollout_valwin_fbnoise.log
fi

# --- 16. regenerate PARITY.md with everything the queue produced, then a
#         final bench re-warm so the driver's end-of-round bench.py is hot
python tools/make_parity_report.py || true
bash $W python bench.py > tools/parity/bench_rewarm3_r3.log 2>&1 || true
tail -1 tools/parity/bench_rewarm3_r3.log
echo "ROUND3 QUEUE1 CHAIN DONE"
