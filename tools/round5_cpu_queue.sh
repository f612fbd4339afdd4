#!/bin/bash
# Round-5 CPU queue: closed-loop chapter (VERDICT r4 item 3) + torch anchors.
# Rollout-side experiments are CPU-feasible (NOTES_ROUND4: ~45 min for 3
# members over the full 1080-month val window, nice -19) — never blocks the
# TPU queue. Idempotent via output-file skip-guards.
cd "$(dirname "$0")/.."
set -x
P=tools/parity
STATE4=$P/round4_queue_state.txt
STATE5=$P/round5_queue_state.txt

ckpt4() { grep "^$1=" $STATE4 2>/dev/null | tail -1 | cut -d= -f2; }
ckpt5() { grep "^$1=" $STATE5 2>/dev/null | tail -1 | cut -d= -f2; }
CKPT_C=$(grep CKPT_C $P/round3_queue_state.txt | tail -1 | cut -d= -f2)  # fbchain2 s42
CKPT_SS=$(ckpt4 CKPT_SS)
CKPT_S43=$(ckpt4 CKPT_S43)

valwin_npz() { # $1 = rollout log -> path of the valwin npz (from the run's own output)
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

solo_roll() { # $1 tag, $2 ckpt, extra overrides after — CPU, full val window
  local TAG=$1 CK=$2; shift 2
  if [ -n "$CK" ] && [ -d "$CK" ] && [ ! -f $P/rollout_valwin_${TAG}.log ]; then
    nice -19 python -m climate_tpu.cli.rollout ckpt_path=$CK data=data_final \
      model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
      trainer.accelerator=cpu rollout.months=24 rollout.feedback=true \
      rollout.val_window=true rollout.seed_history=true "$@" \
      output_dir=/tmp/rollout_runs > $P/rollout_valwin_${TAG}.log 2>&1 || true
    tail -2 $P/rollout_valwin_${TAG}.log
  fi
}

# --- 1. solo closed-loop scores for the round-4 members (ensemble weights) ---
solo_roll ss25 "$CKPT_SS"
solo_roll fbchain2s43 "$CKPT_S43"
# s44 lands mid-round from the TPU queue; pick it up when present
for i in $(seq 1 60); do
  CKPT_S44=$(ckpt5 CKPT_S44)
  [ -n "$CKPT_S44" ] && break
  [ -f $P/rollout_valwin_fbchain2s44.log ] && break
  sleep 300
done
solo_roll fbchain2s44 "$CKPT_S44"

# --- 2. 4-member closed-loop ensembles (uniform / weighted / +history-cal) ---
CKPT_S44=$(ckpt5 CKPT_S44)
if [ -n "$CKPT_SS" ] && [ -n "$CKPT_S43" ] && [ -n "$CKPT_S44" ]; then
  ens_roll() { # $1 tag, extra overrides after
    local TAG=$1; shift
    if [ ! -f $P/rollout_valwin_${TAG}.log ]; then
      nice -19 python -m climate_tpu.cli.rollout ckpt_path=$CKPT_C data=data_final \
        model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
        "rollout.extra_ckpts=[$CKPT_S43,$CKPT_S44,$CKPT_SS]" \
        trainer.accelerator=cpu rollout.months=24 rollout.feedback=true \
        rollout.val_window=true rollout.seed_history=true "$@" \
        output_dir=/tmp/rollout_runs > $P/rollout_valwin_${TAG}.log 2>&1 || true
      tail -2 $P/rollout_valwin_${TAG}.log
      NPZ=$(valwin_npz $P/rollout_valwin_${TAG}.log)
      if [ -n "$NPZ" ]; then
        cp "$NPZ" $P/valwin_${TAG}.npz
        nice -19 python tools/closed_loop_calibrate.py $P/valwin_${TAG}.npz \
          > $P/valwin_${TAG}_calib.json 2>/dev/null || true
        tail -1 $P/valwin_${TAG}_calib.json
      fi
    fi
  }
  ens_roll r5ens4
  WEIGHTS=$(python - <<PY
import json
s = []
for tag in ('fbchain2', 'fbchain2s43', 'fbchain2s44', 'ss25'):
    v = None
    try:
        for line in reversed(open(f'$P/rollout_valwin_{tag}.log').read().splitlines()):
            line = line.strip()
            if line.startswith('{'):
                try:
                    v = json.loads(line)['val_window_closed_loop_composite']; break
                except Exception:
                    continue
    except FileNotFoundError:
        pass
    if v is None:
        raise SystemExit(1)
    s.append(v)
print('[' + ','.join(f'{1.0/x**2:.4f}' for x in s) + ']')
PY
) || WEIGHTS=""
  if [ -n "$WEIGHTS" ]; then
    ens_roll r5ens4w "rollout.member_weights=$WEIGHTS"
    ens_roll r5ens4whcal "rollout.member_weights=$WEIGHTS" rollout.calibrate_history=true
  fi
fi
python tools/make_parity_report.py || true
echo "QUEUE_R5 CLOSED-LOOP BLOCK DONE"

# --- 3. torch ensemble-pipeline anchor (VERDICT r4 missing #4; epoch-bounded) ---
if [ ! -f $P/torch_cnn_transformer_ensemble_e5.json ]; then
  nice -19 python tools/parity_run.py --stack torch --model cnn_transformer \
    --pipeline ensemble --epochs 5 > $P/torch_cnn_t_ensemble_r5.log 2>&1 || true
  tail -2 $P/torch_cnn_t_ensemble_r5.log
fi
# matching jax ensemble-pipeline e5 run for the same-split comparison
if [ ! -f $P/jax_cnn_transformer_ensemble_e5.json ]; then
  PARITY_JAX_PLATFORM=cpu nice -19 python tools/parity_run.py --stack jax \
    --model cnn_transformer --pipeline ensemble --epochs 5 \
    > $P/jax_cnn_t_ensemble_r5.log 2>&1 || true
  tail -2 $P/jax_cnn_t_ensemble_r5.log
fi

# --- 4. resume the SimpleCNN torch anchor (runs for the rest of the round;
#        epoch-level resume survives restarts — parity_run.py _resume.pt) ---
nice -19 python tools/parity_run.py --stack torch --model SimpleCNN \
  --pipeline baseline --epochs 50 >> $P/torch_simplecnn_run.log 2>&1 || true
echo "QUEUE_R5 CPU DONE"
