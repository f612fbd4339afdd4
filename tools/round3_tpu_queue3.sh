#!/bin/bash
# Round-3 TPU queue #3: replaces queue #2 (killed while blocked on the
# second axon TPU outage of 2026-08-17, ~20:50+; job A had produced only
# tpu_when_alive banners). Adds the two jobs that landed on the host in the
# meantime: the closed-loop ENSEMBLE rollout (cli/rollout.py
# rollout.extra_ckpts — average feedback members inside the scan) and the
# fp32-vs-bf16 input-storage bench ablation. Order = judge value:
#   A. slice-gather bench A/B (>=7k samples/s candidate; now with bf16
#      input storage, the other half of the gather-bandwidth attack)
#   B. chained self-forcing e50 + calibrated/raw val-window closed loop
#   C. ensemble closed-loop rollouts (2-member, then 3/4-member as the new
#      checkpoints appear)
#   D. prev-noise ablation e50 + closed loop
#   E. kernel/per-step bench A/Bs + data-storage ablation
#   F. driver re-warm at the shipped default + report regen
#   G. quality extras (target already met at 0.4703 — lowest priority)
# Every job keeps an output-file skip-guard: idempotent across restarts.
cd "$(dirname "$0")/.."
set -x
W="tools/tpu_when_alive.sh"
RUNS=tools/parity/jax_runs
STATE=tools/parity/round3_queue_state.txt

newest_ckpt() { ls -td $RUNS/*/*/checkpoints 2>/dev/null | head -1; }
ckpt() { grep "$1" $STATE | tail -1 | cut -d= -f2; }

# --- A. slice window-gather A/B (per-step first: fast compile, immediate
#        signal; then the fused-epoch candidate for the >=7k headline)
if [ ! -f tools/parity/bench_slice_perstep_r3.log ]; then
  CLIMATE_TPU_BENCH_GATHER=slice CLIMATE_TPU_BENCH_FUSED=0 bash $W python bench.py \
    > tools/parity/bench_slice_perstep_r3.log 2>&1 || true
  tail -1 tools/parity/bench_slice_perstep_r3.log
fi
if [ ! -f tools/parity/bench_slice_fused_r3.log ]; then
  CLIMATE_TPU_BENCH_GATHER=slice bash $W python bench.py \
    > tools/parity/bench_slice_fused_r3.log 2>&1 || true
  tail -1 tools/parity/bench_slice_fused_r3.log
fi

# --- B. chained self-forcing flagship e50 (k=2 + prev-noise) + calibration
if [ ! -f tools/parity/jax_unet_convlstm_attention_final_fbchain2_e50.json ]; then
  PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr] training.self_force_weight=0.5 training.self_force_steps=2 training.prev_noise=0.05 training.fit_calibration=true" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag fbchain2 --save-preds
  echo "CKPT_C=$(newest_ckpt)/best" >> $STATE
fi
CKPT_A=$(ckpt CKPT_A); CKPT_B=$(ckpt CKPT_B); CKPT_C=$(ckpt CKPT_C)

# val-window closed-loop on it, raw + calibrated scoring
if [ -n "$CKPT_C" ] && [ ! -f tools/parity/rollout_valwin_fbchain2.log ]; then
  bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_C data=data_final \
    model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
    rollout.months=24 rollout.feedback=true \
    rollout.val_window=true rollout.seed_history=true \
    output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_fbchain2.log 2>&1 || true
  tail -2 tools/parity/rollout_valwin_fbchain2.log
fi
if [ -n "$CKPT_C" ] && [ ! -f tools/parity/rollout_valwin_fbchain2_calib.log ]; then
  bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_C data=data_final \
    model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
    rollout.months=24 rollout.feedback=true rollout.calibrate=true \
    rollout.val_window=true rollout.seed_history=true \
    output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_fbchain2_calib.log 2>&1 || true
  tail -2 tools/parity/rollout_valwin_fbchain2_calib.log
fi

# --- C. ensemble closed-loop rollout: feedback members averaged INSIDE the
#        scan (the fed-back history is the ensemble mean, so member errors
#        decorrelate before they compound). Members so far: fbbase (A,
#        1.2871 solo), fbselfforce (B, 1.0960 solo), fbchain2 (C).
if [ -n "$CKPT_C" ] && [ ! -f tools/parity/rollout_valwin_ens3.log ]; then
  bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_B data=data_final \
    model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
    "rollout.extra_ckpts=[$CKPT_A,$CKPT_C]" \
    rollout.months=24 rollout.feedback=true \
    rollout.val_window=true rollout.seed_history=true \
    output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_ens3.log 2>&1 || true
  tail -2 tools/parity/rollout_valwin_ens3.log
fi

# --- D. prev-noise-only ablation e50 + closed-loop
if [ ! -f tools/parity/jax_unet_convlstm_attention_final_fbnoise_e50.json ]; then
  PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr] training.prev_noise=0.1" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag fbnoise --save-preds
  echo "CKPT_D=$(newest_ckpt)/best" >> $STATE
fi
CKPT_D=$(ckpt CKPT_D)
if [ -n "$CKPT_D" ] && [ ! -f tools/parity/rollout_valwin_fbnoise.log ]; then
  bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_D data=data_final \
    model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
    rollout.months=24 rollout.feedback=true \
    rollout.val_window=true rollout.seed_history=true \
    output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_fbnoise.log 2>&1 || true
  tail -2 tools/parity/rollout_valwin_fbnoise.log
fi
# 4-member ensemble once fbnoise exists
if [ -n "$CKPT_D" ] && [ -n "$CKPT_C" ] && [ ! -f tools/parity/rollout_valwin_ens4.log ]; then
  bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_B data=data_final \
    model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
    "rollout.extra_ckpts=[$CKPT_A,$CKPT_C,$CKPT_D]" \
    rollout.months=24 rollout.feedback=true \
    rollout.val_window=true rollout.seed_history=true \
    output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_ens4.log 2>&1 || true
  tail -2 tools/parity/rollout_valwin_ens4.log
fi

# --- E. bench A/Bs: fused-ConvLSTM Pallas kernel per-step (the whole-epoch
#        scan with the kernel inside OOM-kills the remote compiler —
#        recorded), default per-step, and the fp32-storage ablation
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
if [ ! -f tools/parity/bench_datafp32_perstep_r3.log ]; then
  CLIMATE_TPU_BENCH_DATA_BF16=0 CLIMATE_TPU_BENCH_FUSED=0 bash $W python bench.py \
    > tools/parity/bench_datafp32_perstep_r3.log 2>&1 || true
  tail -1 tools/parity/bench_datafp32_perstep_r3.log
fi

# --- F. driver re-warm at the CURRENT default config + report regen
bash $W python bench.py > tools/parity/bench_rewarm_r3.log 2>&1 || true
tail -1 tools/parity/bench_rewarm_r3.log
python tools/make_parity_report.py || true
echo "ROUND3 QUEUE3 CRITICAL DONE"

# --- G. quality extras (quality target already met: 0.4703 weighted ensemble)
if [ ! -f tools/parity/jax_cnn_transformer_ensemble_cos300w384_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=46" \
    bash $W python tools/parity_run.py --stack jax --model cnn_transformer \
    --pipeline ensemble --epochs 300 \
    --model-kw '{"embed_dim": 384, "mlp_dim": 768, "n_heads": 8}' \
    --tag "cos300w384" --save-preds
fi
if [ ! -f tools/parity/jax_cnn_transformer_ensemble_calib300w256_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=48 training.fit_calibration=true" \
    bash $W python tools/parity_run.py --stack jax --model cnn_transformer \
    --pipeline ensemble --epochs 300 \
    --model-kw '{"embed_dim": 256, "mlp_dim": 512}' \
    --tag "calib300w256" --save-preds
  echo "CKPT_CALIB=$(newest_ckpt)/best" >> $STATE
fi
if [ ! -f tools/parity/jax_cnn_transformer_ensemble_mm300w256_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=45 training.moment_loss_weight=1.0" \
    bash $W python tools/parity_run.py --stack jax --model cnn_transformer \
    --pipeline ensemble --epochs 300 \
    --model-kw '{"embed_dim": 256, "mlp_dim": 512}' \
    --tag "mm300w256" --save-preds
fi
if [ ! -f tools/parity/jax_cnn_transformer_ensemble_cos600w256_e600.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=47" \
    bash $W python tools/parity_run.py --stack jax --model cnn_transformer \
    --pipeline ensemble --epochs 600 \
    --model-kw '{"embed_dim": 256, "mlp_dim": 512}' \
    --tag "cos600w256" --save-preds
fi

# --- H. final report regen + bench re-warm for the driver's end-of-round run
python tools/make_parity_report.py || true
bash $W python bench.py > tools/parity/bench_rewarm3_r3.log 2>&1 || true
tail -1 tools/parity/bench_rewarm3_r3.log
echo "ROUND3 QUEUE3 DONE"

# --- I. stack depth (appended): extra members for the cross-family weighted
#        ensemble (PARITY.md 0.4495) — run only if time permits
if [ ! -f tools/parity/jax_unet_convlstm_attention_final_cos300seed45_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=45" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 300 --seq-len 6 --tag cos300seed45 --save-preds
fi
if [ ! -f tools/parity/jax_cnn_transformer_ensemble_cos300w256d6_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=46" \
    bash $W python tools/parity_run.py --stack jax --model cnn_transformer \
    --pipeline ensemble --epochs 300 \
    --model-kw '{"embed_dim": 256, "mlp_dim": 512, "depth": 6}' \
    --tag "cos300w256d6" --save-preds
fi
python tools/make_parity_report.py || true
echo "ROUND3 QUEUE3 STACK EXTRAS DONE"

# --- K. weighted closed-loop ensemble (appended): convex member weights
#        = inverse-squared SOLO closed-loop error (from the solo val-window
#        logs), so the stronger self-forced members dominate the fed-back mean
if [ -n "$CKPT_D" ] && [ -n "$CKPT_C" ] && [ ! -f tools/parity/rollout_valwin_ens4w.log ]; then
  WEIGHTS=$(python - <<'PY'
import json
def s(p):
    for line in reversed(open(p).read().splitlines()):
        line = line.strip()
        if line.startswith('{'):
            try: return json.loads(line)['val_window_closed_loop_composite']
            except Exception: continue
    raise SystemExit(f'no composite in {p}')
xs = [s('tools/parity/rollout_valwin_selfforce.log'),
      s('tools/parity/rollout_valwin_base.log'),
      s('tools/parity/rollout_valwin_fbchain2.log'),
      s('tools/parity/rollout_valwin_fbnoise.log')]
print('[' + ','.join(f'{1.0/x**2:.4f}' for x in xs) + ']')
PY
) || WEIGHTS=""
  if [ -n "$WEIGHTS" ]; then
    bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_B data=data_final \
      model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
      "rollout.extra_ckpts=[$CKPT_A,$CKPT_C,$CKPT_D]" \
      "rollout.member_weights=$WEIGHTS" \
      rollout.months=24 rollout.feedback=true \
      rollout.val_window=true rollout.seed_history=true \
      output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_ens4w.log 2>&1 || true
    tail -2 tools/parity/rollout_valwin_ens4w.log
  fi
fi
python tools/make_parity_report.py || true
echo "ROUND3 QUEUE3 WEIGHTED-ENS DONE"
