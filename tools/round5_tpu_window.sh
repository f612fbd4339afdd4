#!/bin/bash
# Round-5 late-TPU-window jobs: new DIVERSITY members for the forcing-only
# stack (VERDICT r4 item 6 — push the 12-member 0.4415 below 0.43).
# Runs ONLY after BOTH the main TPU queue and the postqueue roofline have
# released the chip (serial TPU access — two clients on the axon tunnel is
# an untested risk, see .claude/skills/verify "TPU tunnel fragility").
# Every signature here is disk-cached (seq12 solo from round 3; the K=4
# forcing-only step from this morning's CLIMATE_TPU_BENCH_MEMBERS=4 run),
# so no 20-40 min cold compiles. Ends with one bench.py sanity run so the
# chip is proven idle+healthy for the driver's end-of-round bench.
cd "$(dirname "$0")/.."
set -x
P=tools/parity
W=tools/tpu_when_alive.sh
HARD_STOP=$(date -u -d '13:20' +%s)
past() { [ "$(date -u +%s)" -ge "$1" ]; }

while :; do
  if grep -q 'QUEUE_R5 TPU DONE' $P/round5_main.log 2>/dev/null &&
     grep -q 'POSTQUEUE_R5 DONE' $P/round5_postqueue.log 2>/dev/null; then
    break
  fi
  # fallback: both processes gone without markers (crash) also releases
  QPID=$(cat /tmp/r5_tpu_main.pid 2>/dev/null)
  PPID2=$(cat /tmp/r5_postqueue.pid 2>/dev/null)
  if [ -n "$QPID" ] && ! ps -p "$QPID" >/dev/null 2>&1 &&
     { [ -z "$PPID2" ] || ! ps -p "$PPID2" >/dev/null 2>&1; }; then
    break
  fi
  past "$HARD_STOP" && exit 0
  sleep 60
done

# --- 1. K=4 vmapped forcing-only flagship, new seeds 47-50 (cos e300):
#        4 more stack members from one run (step sig cached by the K=4 bench;
#        ~50 min) — the biggest prize, so it goes first ---
if ! past "$(date -u -d '12:25' +%s)" && [ ! -f $P/jax_unet_convlstm_attention_final_mm4cos300_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine" \
    bash $W timeout 4200 python tools/parity_run.py --stack jax \
    --model unet_convlstm_attention --pipeline final --epochs 300 --seq-len 6 \
    --tag mm4cos300 --save-preds --members 4 --member-seeds 47,48,49,50
fi

# --- 2. seq12 diversity member (cached sig, ~20 min; solo seq12cosine e150
#        scored 0.7535 best — a genuinely different window than every
#        existing stack member) ---
if ! past "$(date -u -d '12:55' +%s)" && [ ! -f $P/jax_unet_convlstm_attention_final_seq12cos300_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=46" \
    bash $W timeout 2700 python tools/parity_run.py --stack jax \
    --model unet_convlstm_attention --pipeline final --epochs 300 --seq-len 12 \
    --tag seq12cos300 --save-preds
fi

# --- 3. spare: one more cnn_t ensemble seed (cached sig, ~25 min) ---
if ! past "$(date -u -d '12:45' +%s)" && [ ! -f $P/jax_cnn_transformer_ensemble_cos300seed45_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=45" \
    bash $W timeout 2400 python tools/parity_run.py --stack jax \
    --model cnn_transformer --pipeline ensemble --epochs 300 \
    --tag cos300seed45 --save-preds
fi

# --- FINAL: prove the chip healthy + cache warm for the driver's bench ---
timeout 900 python bench.py > $P/bench_r5_window_final.json 2>/dev/null || true
tail -1 $P/bench_r5_window_final.json
echo "WINDOW_R5 DONE"
