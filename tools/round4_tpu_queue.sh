#!/bin/bash
# Round-4 TPU queue: runs AFTER round3_tpu_queue4.sh drains (waits on its
# marker/pid). Priorities from VERDICT round 3:
#   1. scheduled-sampling e50 (the "implemented but never trained" gap) +
#      fbchain2 seed members -> 4-member weighted closed-loop ensemble
#      (+ the new in-scan fed-back-history calibration A/B)
#   2. HBM/latency roofline for the step (bench.py CLIMATE_TPU_BENCH_ROOFLINE)
#   3. UNet endpoint-gap seeds
#   4. large-batch rows WITH bf16 input storage + SCAN_BATCHES=64 A/B +
#      fused-ConvLSTM large-batch closure shot
#   5. quality: refit the cross-family stack with the round-4 members
# Every job keeps an output-file skip-guard: idempotent across restarts.
cd "$(dirname "$0")/.."
set -x
W="tools/tpu_when_alive.sh"
RUNS=tools/parity/jax_runs
STATE=tools/parity/round4_queue_state.txt
P=tools/parity

newest_ckpt() { ls -td $RUNS/*/*/checkpoints 2>/dev/null | head -1; }
ckpt() { grep "$1" $STATE 2>/dev/null | tail -1 | cut -d= -f2; }
# val-window npz lives next to the rollout JSON's npz path — derive it from
# the run's OWN output line (queue4's `ls -t` shortcut grabbed a stale run
# when the rollout failed, mislabeling the artifact; never again)
valwin_npz() { # $1 = rollout log
  python - "$1" <<'PY'
import json, os, sys
for line in reversed(open(sys.argv[1]).read().splitlines()):
    line = line.strip()
    if line.startswith('{'):
        try:
            d = json.loads(line)
            p = os.path.join(os.path.dirname(d['npz']), 'valwin_closed_loop.npz')
            print(p if os.path.exists(p) else '')
            break
        except Exception:
            continue
PY
}
solo_score() { # $1 = rollout log -> composite or empty
  python - "$1" <<'PY'
import json, sys
for line in reversed(open(sys.argv[1]).read().splitlines()):
    line = line.strip()
    if line.startswith('{'):
        try:
            print(json.loads(line)['val_window_closed_loop_composite']); break
        except Exception:
            continue
PY
}

# --- 0. wait for queue4 to drain (marker, or its shell gone) ---
while ! grep -q 'QUEUE4 DONE' $P/round3_queue.log 2>/dev/null; do
  QPID=$(cat /tmp/queue4.pid 2>/dev/null)
  if [ -n "$QPID" ] && ! ps -p "$QPID" > /dev/null 2>&1; then break; fi
  sleep 120
done

CKPT_C=$(grep CKPT_C $P/round3_queue_state.txt | tail -1 | cut -d= -f2)  # fbchain2 s42

# --- 1. roofline (cheap: per-step signature is warm from today) ---
if [ ! -f $P/bench_roofline_r4.log ]; then
  CLIMATE_TPU_BENCH_ROOFLINE=1 CLIMATE_TPU_BENCH_FUSED=0 bash $W python bench.py \
    > $P/bench_roofline_r4.log 2>&1 || true
  tail -2 $P/bench_roofline_r4.log
fi

# --- 2. scheduled-sampling e50 (fbchain2 recipe + 25-epoch ramp to p=1) ---
if [ ! -f $P/jax_unet_convlstm_attention_final_ss25_e50.json ]; then
  PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr] training.self_force_weight=0.5 training.self_force_steps=2 training.prev_noise=0.05 training.sched_sampling_epochs=25 training.sched_sampling_max=1.0 training.fit_calibration=true" \
    bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
    --pipeline final --epochs 50 --seq-len 6 --tag ss25 --save-preds
  echo "CKPT_SS=$(newest_ckpt)/best" >> $STATE
fi
# --- 3. fbchain2 seed members (cached signature: ~3 min each) ---
for SD in 43 44; do
  if [ ! -f $P/jax_unet_convlstm_attention_final_fbchain2s${SD}_e50.json ]; then
    PARITY_EXTRA_OVERRIDES="data.feedback_vars=[tas,pr] training.self_force_weight=0.5 training.self_force_steps=2 training.prev_noise=0.05 training.fit_calibration=true seed=${SD}" \
      bash $W python tools/parity_run.py --stack jax --model unet_convlstm_attention \
      --pipeline final --epochs 50 --seq-len 6 --tag fbchain2s${SD} --save-preds
    echo "CKPT_S${SD}=$(newest_ckpt)/best" >> $STATE
  fi
done
CKPT_SS=$(ckpt CKPT_SS); CKPT_S43=$(ckpt CKPT_S43); CKPT_S44=$(ckpt CKPT_S44)

# --- 4. solo val-window rollouts (weights for the ensemble + PARITY rows) ---
solo_roll() { # $1 tag, $2 ckpt, extra args after
  local TAG=$1 CK=$2; shift 2
  if [ -n "$CK" ] && [ ! -f $P/rollout_valwin_${TAG}.log ]; then
    bash $W python -m climate_tpu.cli.rollout ckpt_path=$CK data=data_final \
      model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
      rollout.months=24 rollout.feedback=true \
      rollout.val_window=true rollout.seed_history=true "$@" \
      output_dir=/tmp/rollout_runs > $P/rollout_valwin_${TAG}.log 2>&1 || true
    tail -2 $P/rollout_valwin_${TAG}.log
  fi
}
solo_roll ss25 "$CKPT_SS"
solo_roll fbchain2s43 "$CKPT_S43"
solo_roll fbchain2s44 "$CKPT_S44"
# in-scan fed-back-history calibration A/B on the best solo member (alphas
# from the checkpoint's train-fitted calibration meta)
solo_roll fbchain2_hcal "$CKPT_C" rollout.calibrate_history=true
# history calibration + post-hoc scored-output calibration composed
solo_roll fbchain2_hcal_both "$CKPT_C" rollout.calibrate_history=true rollout.calibrate=true

# --- 5. 4-member ensembles (fbchain2 s42/s43/s44 + ss25) ---
if [ -n "$CKPT_SS" ] && [ -n "$CKPT_S43" ] && [ -n "$CKPT_S44" ]; then
  if [ ! -f $P/rollout_valwin_r4ens4.log ]; then
    bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_C data=data_final \
      model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
      "rollout.extra_ckpts=[$CKPT_S43,$CKPT_S44,$CKPT_SS]" \
      rollout.months=24 rollout.feedback=true \
      rollout.val_window=true rollout.seed_history=true \
      output_dir=/tmp/rollout_runs > $P/rollout_valwin_r4ens4.log 2>&1 || true
    tail -2 $P/rollout_valwin_r4ens4.log
    NPZ=$(valwin_npz $P/rollout_valwin_r4ens4.log)
    if [ -n "$NPZ" ]; then
      cp "$NPZ" $P/valwin_r4ens4.npz
      python tools/closed_loop_calibrate.py $P/valwin_r4ens4.npz \
        > $P/valwin_r4ens4_calib.json 2>/dev/null || true
      tail -1 $P/valwin_r4ens4_calib.json
    fi
  fi
  # weighted by inverse-sq solo closed-loop error
  if [ ! -f $P/rollout_valwin_r4ens4w.log ]; then
    WEIGHTS=$(python - <<PY
s = []
import json
for tag in ('fbchain2', 'fbchain2s43', 'fbchain2s44', 'ss25'):
    v = None
    for line in reversed(open(f'$P/rollout_valwin_{tag}.log').read().splitlines()):
        line = line.strip()
        if line.startswith('{'):
            try:
                v = json.loads(line)['val_window_closed_loop_composite']; break
            except Exception:
                continue
    if v is None:
        raise SystemExit(f'no composite for {tag}')
    s.append(v)
print('[' + ','.join(f'{1.0/x**2:.4f}' for x in s) + ']')
PY
) || WEIGHTS=""
    if [ -n "$WEIGHTS" ]; then
      bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_C data=data_final \
        model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
        "rollout.extra_ckpts=[$CKPT_S43,$CKPT_S44,$CKPT_SS]" \
        "rollout.member_weights=$WEIGHTS" \
        rollout.months=24 rollout.feedback=true \
        rollout.val_window=true rollout.seed_history=true \
        output_dir=/tmp/rollout_runs > $P/rollout_valwin_r4ens4w.log 2>&1 || true
      tail -2 $P/rollout_valwin_r4ens4w.log
      NPZ=$(valwin_npz $P/rollout_valwin_r4ens4w.log)
      if [ -n "$NPZ" ]; then
        cp "$NPZ" $P/valwin_r4ens4w.npz
        python tools/closed_loop_calibrate.py $P/valwin_r4ens4w.npz \
          > $P/valwin_r4ens4w_calib.json 2>/dev/null || true
        tail -1 $P/valwin_r4ens4w_calib.json
      fi
    fi
  fi
  # weighted + in-scan history calibration (ensemble mean fed back calibrated)
  if [ -f $P/rollout_valwin_r4ens4w.log ] && [ ! -f $P/rollout_valwin_r4ens4whcal.log ]; then
    WEIGHTS=$(grep -o 'weights \[[^]]*\]' $P/rollout_valwin_r4ens4w.log | head -1 | sed 's/weights //; s/ //g')
    if [ -n "$WEIGHTS" ]; then
      bash $W python -m climate_tpu.cli.rollout ckpt_path=$CKPT_C data=data_final \
        model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
        "rollout.extra_ckpts=[$CKPT_S43,$CKPT_S44,$CKPT_SS]" \
        "rollout.member_weights=$WEIGHTS" rollout.calibrate_history=true \
        rollout.months=24 rollout.feedback=true \
        rollout.val_window=true rollout.seed_history=true \
        output_dir=/tmp/rollout_runs > $P/rollout_valwin_r4ens4whcal.log 2>&1 || true
      tail -2 $P/rollout_valwin_r4ens4whcal.log
      NPZ=$(valwin_npz $P/rollout_valwin_r4ens4whcal.log)
      if [ -n "$NPZ" ]; then
        cp "$NPZ" $P/valwin_r4ens4whcal.npz
        python tools/closed_loop_calibrate.py $P/valwin_r4ens4whcal.npz \
          > $P/valwin_r4ens4whcal_calib.json 2>/dev/null || true
        tail -1 $P/valwin_r4ens4whcal_calib.json
      fi
    fi
  fi
fi
python tools/make_parity_report.py || true
echo "QUEUE_R4 CLOSED-LOOP BLOCK DONE"

# --- 6. UNet endpoint-gap seeds (VERDICT #3; cached signature, ~2 min each) ---
for SD in 43 44; do
  if [ ! -f $P/jax_unet_baseline_s${SD}_e50.json ]; then
    PARITY_EXTRA_OVERRIDES="seed=${SD}" \
      bash $W python tools/parity_run.py --stack jax --model unet \
      --pipeline baseline --epochs 50 --tag s${SD}
  fi
done

# --- 7. perf A/Bs (each is one fresh remote compile; ordered by value) ---
# 7a. fused epoch with a 64-step scan (dispatch amortization A/B vs 32)
if [ ! -f $P/bench_scan64_r4.log ]; then
  CLIMATE_TPU_BENCH_SCAN_BATCHES=64 bash $W python bench.py \
    > $P/bench_scan64_r4.log 2>&1 || true
  tail -1 $P/bench_scan64_r4.log
fi
# 7b. large-batch rows WITH bf16 input storage (VERDICT #7; r3 rows were fp32)
if [ ! -f $P/bench_batch256_r4.log ]; then
  CLIMATE_TPU_BENCH_BATCH=256 bash $W python bench.py \
    > $P/bench_batch256_r4.log 2>&1 || true
  tail -1 $P/bench_batch256_r4.log
fi
if [ ! -f $P/bench_batch512_r4.log ]; then
  CLIMATE_TPU_BENCH_BATCH=512 bash $W python bench.py \
    > $P/bench_batch512_r4.log 2>&1 || true
  tail -1 $P/bench_batch512_r4.log
fi
# 7c. fused-ConvLSTM kernel large-batch closure shot (VERDICT #5)
if [ ! -f $P/bench_fused_lstm_b256_r4.log ]; then
  CLIMATE_TPU_CONVLSTM=fused CLIMATE_TPU_BENCH_BATCH=256 CLIMATE_TPU_BENCH_FUSED=0 \
    bash $W python bench.py > $P/bench_fused_lstm_b256_r4.log 2>&1 || true
  tail -1 $P/bench_fused_lstm_b256_r4.log
fi
echo "QUEUE_R4 PERF BLOCK DONE"

# --- 8. quality: refit the cross-family stack with the round-4 members ---
if [ ! -f $P/ensemble_cross12_forcing.json ]; then
  M9="$P/jax_cnn_transformer_ensemble_cos300seed42_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300seed43_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300seed44_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300wide_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300wide256_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_base24cos300_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_cos300seed42_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_cos300seed43_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_cos300seed44_e300_valpreds.npz"
  EXTRA=""
  for f in $P/jax_unet_convlstm_attention_final_cos300seed45_e300_valpreds.npz \
           $P/jax_cnn_transformer_ensemble_cos300w384_e300_valpreds.npz \
           $P/jax_cnn_transformer_ensemble_calib300w256_e300_valpreds.npz; do
    [ -f "$f" ] && EXTRA="$EXTRA $f"
  done
  if [ -n "$EXTRA" ]; then
    nice -19 python tools/ensemble_eval.py --weighted --holdout --align-tail \
      $M9 $EXTRA > $P/ensemble_cross12_forcing.json 2>$P/ensemble_cross12_forcing.err || true
    tail -1 $P/ensemble_cross12_forcing.json
  fi
fi

# --- 9. final report regen + DOUBLE bench rewarm for the driver snapshot ---
python tools/make_parity_report.py || true
bash $W python bench.py > $P/bench_rewarm_r4a.log 2>&1 || true
tail -1 $P/bench_rewarm_r4a.log
bash $W python bench.py > $P/bench_rewarm_r4b.log 2>&1 || true
tail -1 $P/bench_rewarm_r4b.log
echo "QUEUE_R4 DONE"
