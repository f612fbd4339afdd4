#!/bin/bash
# Round-5 CPU queue v2: closed-loop chapter against the REBUILT member pool
# (round5_tpu_queue2.sh retrains it — the round boundary wiped all round-3/4
# checkpoints). All rollout/calibration work is CPU-feasible (NOTES_ROUND4).
# Torch anchors run at the end. Idempotent via output-file skip-guards.
cd "$(dirname "$0")/.."
set -x
P=tools/parity
STATE=$P/round5_queue_state.txt

ckpt() { grep "^$1=" $STATE 2>/dev/null | tail -1 | cut -d= -f2; }

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

comp_of() { # $1 = rollout log -> closed-loop composite or empty
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

# --- 0. wait for the rebuilt member pool (s44 from queue 1, fb pool + ss
#        from queue 2); up to 8 h of 5-min polls ---
for i in $(seq 1 96); do
  [ -n "$(ckpt CKPT_FB0)" ] && [ -n "$(ckpt CKPT_SS)" ] && break
  sleep 300
done
CKPT_S44=$(ckpt CKPT_S44)
CKPT_FB0=$(ckpt CKPT_FB0)  # seed 42
CKPT_FB1=$(ckpt CKPT_FB1)  # seed 43
CKPT_FB2=$(ckpt CKPT_FB2)  # seed 45
CKPT_FB3=$(ckpt CKPT_FB3)  # seed 46
CKPT_SS=$(ckpt CKPT_SS)

# --- 1. solo closed-loop scores (ensemble weights + PARITY rows) ---
solo_roll r5fb42 "$CKPT_FB0"
solo_roll r5fb43 "$CKPT_FB1"
solo_roll r5fb45 "$CKPT_FB2"
solo_roll r5fb46 "$CKPT_FB3"
solo_roll r5s44 "$CKPT_S44"
solo_roll r5ss25 "$CKPT_SS"

# --- 2. multi-member closed-loop ensembles ---
if [ -n "$CKPT_FB0" ] && [ -d "$CKPT_FB0" ]; then
  EXTRA="[$CKPT_FB1,$CKPT_FB2,$CKPT_FB3"
  [ -n "$CKPT_S44" ] && [ -d "$CKPT_S44" ] && EXTRA="$EXTRA,$CKPT_S44"
  [ -n "$CKPT_SS" ] && [ -d "$CKPT_SS" ] && EXTRA="$EXTRA,$CKPT_SS"
  EXTRA="$EXTRA]"
  ens_roll() { # $1 tag, extra overrides after
    local TAG=$1; shift
    if [ ! -f $P/rollout_valwin_${TAG}.log ]; then
      nice -19 python -m climate_tpu.cli.rollout ckpt_path=$CKPT_FB0 data=data_final \
        model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
        "rollout.extra_ckpts=$EXTRA" \
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
  ens_roll r5ensN
  # inverse-sq-error weights from the solo scores
  WEIGHTS=$(python - <<PY
import json, os
tags = ['r5fb42', 'r5fb43', 'r5fb45', 'r5fb46']
if os.path.isdir('$CKPT_S44' or '/nonexistent'):
    tags.append('r5s44')
if os.path.isdir('$CKPT_SS' or '/nonexistent'):
    tags.append('r5ss25')
s = []
for tag in tags:
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
    ens_roll r5ensNw "rollout.member_weights=$WEIGHTS"
    ens_roll r5ensNwhcal "rollout.member_weights=$WEIGHTS" rollout.calibrate_history=true
  fi
fi
python tools/make_parity_report.py || true
echo "QUEUE_R5 CLOSED-LOOP BLOCK DONE"

# --- 3. torch ensemble-pipeline anchor (VERDICT r4 missing #4) ---
if [ ! -f $P/torch_cnn_transformer_ensemble_e5.json ]; then
  nice -19 python tools/parity_run.py --stack torch --model cnn_transformer \
    --pipeline ensemble --epochs 5 > $P/torch_cnn_t_ensemble_r5.log 2>&1 || true
  tail -2 $P/torch_cnn_t_ensemble_r5.log
fi
if [ ! -f $P/jax_cnn_transformer_ensemble_e5.json ]; then
  PARITY_JAX_PLATFORM=cpu nice -19 python tools/parity_run.py --stack jax \
    --model cnn_transformer --pipeline ensemble --epochs 5 \
    > $P/jax_cnn_t_ensemble_r5.log 2>&1 || true
  tail -2 $P/jax_cnn_t_ensemble_r5.log
fi

# --- 4. resume the SimpleCNN torch anchor (rest of the round; resumable) ---
nice -19 python tools/parity_run.py --stack torch --model SimpleCNN \
  --pipeline baseline --epochs 50 >> $P/torch_simplecnn_run.log 2>&1 || true
echo "QUEUE_R5 CPU DONE"
