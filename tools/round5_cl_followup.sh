#!/bin/bash
# Closed-loop followup, enabled by the discovery that val-window rollouts
# are ~6-10 min on CPU (jit cache hit), not 45: score every pool member's
# SOLO closed-loop composite, then re-run the ensemble with
# inverse-sq-CLOSED-LOOP-error weights (the TF-derived weights overweighted
# scheduled-sampling, whose TF best 0.6523 rolls at 1.0376 — weighting by
# the quantity being optimized is the round-4 plan done right), excluding
# members that roll worse than 1.0.
cd "$(dirname "$0")/.."
set -x
P=tools/parity
STATE=$P/round5_queue_state.txt
DEADLINE=$(date -u -d '13:45' +%s)
past() { [ "$(date -u +%s)" -ge "$1" ]; }
ckpt() { grep "^$1=" $STATE 2>/dev/null | tail -1 | cut -d= -f2; }

while ! grep -q 'ENS_FIXER_R5 DONE' $P/round5_ens_fixer.log 2>/dev/null; do
  FPID=$(cat /tmp/r5_ensfixer.pid 2>/dev/null)
  if [ -n "$FPID" ] && ! ps -p "$FPID" >/dev/null 2>&1; then break; fi
  past "$DEADLINE" && exit 0
  sleep 60
done

solo_roll() { # $1 tag, $2 ckpt
  local TAG=$1 CK=$2
  if [ -n "$CK" ] && [ -d "$CK" ] && [ ! -s $P/rollout_valwin_${TAG}.log ] && ! past "$(date -u -d '12:50' +%s)"; then
    timeout 1800 nice -19 python -m climate_tpu.cli.rollout ckpt_path=$CK data=data_final \
      model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
      trainer.accelerator=cpu rollout.months=24 rollout.feedback=true \
      rollout.val_window=true rollout.seed_history=true \
      output_dir=/tmp/rollout_runs > $P/rollout_valwin_${TAG}.log 2>&1 || true
    grep "closed-loop composite" $P/rollout_valwin_${TAG}.log | tail -1
  fi
}
solo_roll r5s44 "$(ckpt CKPT_S44)"
solo_roll r5fb43 "$(ckpt CKPT_FB1)"
solo_roll r5fb45 "$(ckpt CKPT_FB2)"
solo_roll r5fb46 "$(ckpt CKPT_FB3)"
solo_roll r5fb42 "$(ckpt CKPT_FB0)"

# --- closed-loop-weighted ensemble from the solo scores ---
MW=$(python - <<'PY'
import json, os
P = 'tools/parity'
marks = {}
for line in open(f'{P}/round5_queue_state.txt'):
    if '=' in line:
        k, v = line.strip().split('=', 1)
        marks[k] = v
pool = [('CKPT_S44', 'r5s44'), ('CKPT_FB0', 'r5fb42'), ('CKPT_FB1', 'r5fb43'),
        ('CKPT_FB2', 'r5fb45'), ('CKPT_FB3', 'r5fb46'), ('CKPT_SS', 'r5ss25')]
scored = []
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
        continue
    if score is not None and score < 1.0:
        scored.append((ck, score))
scored.sort(key=lambda p: p[1])
if len(scored) >= 3:
    cks = [c for c, _ in scored]
    ws = [1.0 / s**2 for _, s in scored]
    print(cks[0] + '|[' + ','.join(cks[1:]) + ']|[' + ','.join(f'{w:.4f}' for w in ws) + ']')
PY
)
ens_roll() { # $1 tag, extra overrides after
  local TAG=$1; shift
  if [ -n "$MW" ] && [ ! -s $P/rollout_valwin_${TAG}.log ] && ! past "$DEADLINE"; then
    local LEAD EXTRA WEIGHTS
    LEAD=$(echo "$MW" | cut -d'|' -f1)
    EXTRA=$(echo "$MW" | cut -d'|' -f2)
    WEIGHTS=$(echo "$MW" | cut -d'|' -f3)
    timeout 5400 nice -19 python -m climate_tpu.cli.rollout ckpt_path=$LEAD data=data_final \
      model=unet_convlstm_attention 'data.feedback_vars=[tas,pr]' \
      "rollout.extra_ckpts=$EXTRA" "rollout.member_weights=$WEIGHTS" \
      trainer.accelerator=cpu rollout.months=24 rollout.feedback=true \
      rollout.val_window=true rollout.seed_history=true "$@" \
      output_dir=/tmp/rollout_runs > $P/rollout_valwin_${TAG}.log 2>&1 || true
    grep "closed-loop composite" $P/rollout_valwin_${TAG}.log | tail -1
    NPZ=$(python - "$P/rollout_valwin_${TAG}.log" <<'PY'
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
)
    if [ -n "$NPZ" ]; then
      cp "$NPZ" $P/valwin_${TAG}.npz
      nice -19 python tools/closed_loop_calibrate.py $P/valwin_${TAG}.npz \
        > $P/valwin_${TAG}_calib.json 2>/dev/null || true
      tail -1 $P/valwin_${TAG}_calib.json
    fi
  fi
}
ens_roll r5ensCLw
if ! past "$(date -u -d '13:05' +%s)"; then
  ens_roll r5ensCLwhcal rollout.calibrate_history=true 'rollout.history_alphas=[1.0198,1.1946]'
fi
echo "CL_FOLLOWUP_R5 DONE"
