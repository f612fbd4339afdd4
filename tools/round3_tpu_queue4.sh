#!/bin/bash
# Round-3 TPU queue #4: replaces queue #3 (never got TPU time — the second
# axon outage of 2026-08-17 20:50 is still ongoing at 06:10). REORDERED for a
# shrinking TPU window: the DRIVER-CRITICAL default-config rewarm compiles
# first (the driver runs plain `python bench.py` at round end; the new bf16
# input storage changed the compiled signature, so the fused-epoch default
# MUST be re-warmed or the driver cold-compiles 30-60 min), then the cheap
# cached ablation, then slice A/B, then closed-loop jobs, then quality.
# Every job keeps an output-file skip-guard: idempotent across restarts.
cd "$(dirname "$0")/.."
set -x
W="tools/tpu_when_alive.sh"
RUNS=tools/parity/jax_runs
STATE=tools/parity/round3_queue_state.txt

newest_ckpt() { ls -td $RUNS/*/*/checkpoints 2>/dev/null | head -1; }
ckpt() { grep "$1" $STATE | tail -1 | cut -d= -f2; }

# --- 1. DRIVER-CRITICAL: rewarm the shipped default (fused epoch, mask
#        gather, bf16 compute + bf16 input storage). One compile, cached.
if [ ! -f tools/parity/bench_rewarm_r3.log ]; then
  bash $W python bench.py > tools/parity/bench_rewarm_r3.log 2>&1 || true
  tail -1 tools/parity/bench_rewarm_r3.log
fi

# --- 2. cheap ablation pair: fp32-storage per-step hits the round-2-warmed
#        cache entry (old signature); bf16-storage per-step is one ~20 min
#        compile and becomes the new per-step reference row
if [ ! -f tools/parity/bench_datafp32_perstep_r3.log ]; then
  CLIMATE_TPU_BENCH_DATA_BF16=0 CLIMATE_TPU_BENCH_FUSED=0 bash $W python bench.py \
    > tools/parity/bench_datafp32_perstep_r3.log 2>&1 || true
  tail -1 tools/parity/bench_datafp32_perstep_r3.log
fi
if [ ! -f tools/parity/bench_xla_perstep_r3.log ]; then
  CLIMATE_TPU_BENCH_FUSED=0 bash $W python bench.py \
    > tools/parity/bench_xla_perstep_r3.log 2>&1 || true
  tail -1 tools/parity/bench_xla_perstep_r3.log
fi

# --- 3. slice window-gather A/B (the >=7k candidate)
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
python tools/make_parity_report.py || true
echo "QUEUE4 BENCH BLOCK DONE"

# --- 4. chained self-forcing flagship e50 (k=2 + prev-noise) + closed loop
if [ ! -f tools/parity/jax_unet_convlstm_attention_final_fbchain2_e50.json ]; then
  PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr] training.self_force_weight=0.5 training.self_force_steps=2 training.prev_noise=0.05 training.fit_calibration=true" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag fbchain2 --save-preds
  echo "CKPT_C=$(newest_ckpt)/best" >> $STATE
fi
CKPT_A=$(ckpt CKPT_A); CKPT_B=$(ckpt CKPT_B); CKPT_C=$(ckpt CKPT_C)
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

# --- 5. 4-member closed-loop ensembles (uniform + inverse-sq-error weighted),
#        members: fbselfforce (main) + fbbase + feedback(01-46-29) + fbchain2
FB3=tools/parity/jax_runs/2026-08-17/01-46-29/checkpoints/best
if [ -n "$CKPT_C" ] && [ ! -f tools/parity/rollout_valwin_ens4.log ]; then
  bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_B data=data_final \
    model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
    "rollout.extra_ckpts=[$CKPT_A,$FB3,$CKPT_C]" \
    rollout.months=24 rollout.feedback=true \
    rollout.val_window=true rollout.seed_history=true \
    output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_ens4.log 2>&1 || true
  tail -2 tools/parity/rollout_valwin_ens4.log
  cp "$(ls -t /tmp/rollout_runs/*/*/rollout/valwin_closed_loop.npz | head -1)" \
     tools/parity/valwin_ens4.npz 2>/dev/null || true
  python tools/closed_loop_calibrate.py tools/parity/valwin_ens4.npz \
     > tools/parity/valwin_ens4_calib.json 2>/dev/null || true
  tail -1 tools/parity/valwin_ens4_calib.json
fi
if [ -n "$CKPT_C" ] && [ ! -f tools/parity/rollout_valwin_ens4w.log ]; then
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
      1.287,  # feedback(01-46-29) solo never measured; same training as fbbase
      s('tools/parity/rollout_valwin_fbchain2.log')]
print('[' + ','.join(f'{1.0/x**2:.4f}' for x in xs) + ']')
PY
) || WEIGHTS=""
  if [ -n "$WEIGHTS" ]; then
    bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_B data=data_final \
      model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
      "rollout.extra_ckpts=[$CKPT_A,$FB3,$CKPT_C]" \
      "rollout.member_weights=$WEIGHTS" \
      rollout.months=24 rollout.feedback=true \
      rollout.val_window=true rollout.seed_history=true \
      output_dir=/tmp/rollout_runs > tools/parity/rollout_valwin_ens4w.log 2>&1 || true
    tail -2 tools/parity/rollout_valwin_ens4w.log
    cp "$(ls -t /tmp/rollout_runs/*/*/rollout/valwin_closed_loop.npz | head -1)" \
       tools/parity/valwin_ens4w.npz 2>/dev/null || true
    python tools/closed_loop_calibrate.py tools/parity/valwin_ens4w.npz \
       > tools/parity/valwin_ens4w_calib.json 2>/dev/null || true
    tail -1 tools/parity/valwin_ens4w_calib.json
  fi
fi
python tools/make_parity_report.py || true
echo "QUEUE4 CLOSED-LOOP BLOCK DONE"

# --- 6. prev-noise ablation e50 + closed loop
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

# --- 7. fused-ConvLSTM Pallas kernel per-step A/B (whole-epoch scan with the
#        kernel OOMs the remote compiler — already recorded)
if [ ! -f tools/parity/bench_fused_lstm_perstep_r3.log ]; then
  CLIMATE_TPU_CONVLSTM=fused CLIMATE_TPU_BENCH_FUSED=0 bash $W python bench.py \
    > tools/parity/bench_fused_lstm_perstep_r3.log 2>&1 || true
  tail -1 tools/parity/bench_fused_lstm_perstep_r3.log
fi
python tools/make_parity_report.py || true
echo "QUEUE4 CRITICAL DONE"

# --- 8. quality extras (target already beaten offline: 0.4495 cross-family)
if [ ! -f tools/parity/jax_unet_convlstm_attention_final_cos300seed45_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=45" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 300 --seq-len 6 --tag cos300seed45 --save-preds
fi
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
fi

# --- 9. final report regen + bench rewarm for the driver's end-of-round run
python tools/make_parity_report.py || true
bash $W python bench.py > tools/parity/bench_rewarm3_r3.log 2>&1 || true
tail -1 tools/parity/bench_rewarm3_r3.log
echo "QUEUE4 DONE"
