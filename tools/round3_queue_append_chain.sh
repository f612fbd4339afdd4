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
