#!/bin/bash
# Round-5 NIGHT window (the VM restart wiped the compile cache + checkpoint
# pool; the morning session's TPU window jobs never ran). Rebuilt plan, same
# priorities as VERDICT r4 items 1/5/6:
#   0. wait for the in-flight bench rewarm (PID in /tmp/rewarm1.pid), then
#      one `python bench.py` to prove the driver path parses warm
#   1. NEW forcing-only stack diversity members (all --save-preds):
#      a. unet on the ENSEMBLE pipeline (a third model family for the stack —
#         current stack is 5 cnn_t + 7 flagship; family decorrelation is the
#         cheapest remaining lever toward <0.43)
#      b. cnn_transformer cos300 seed 45 (6th cnn_t seed)
#      c. flagship seq12 cosine e150 (different input window; solo 0.7535 r3)
#   2. stack refit with whatever landed (ensemble_crossR5_forcing.json)
#   3. two-point-slope HBM probe re-emit (hbm_roofline.json)
#   FINAL (always): bench.py twice + tools/round_end_check.sh
# Serial TPU access throughout (one client on the axon tunnel at a time).
cd "$(dirname "$0")/.."
set -x
P=tools/parity
NO_NEW_TRAIN=$(date -u -d '01:25' +%s)   # no new training job after this
ROOFLINE_BY=$(date -u -d '01:50' +%s)
past() { [ "$(date -u +%s)" -ge "$1" ]; }

# --- 0. wait for the rewarm to release the chip, then prove the bench ---
RW=$(cat /tmp/rewarm1.pid 2>/dev/null)
while [ -n "$RW" ] && ps -p "$RW" >/dev/null 2>&1; do sleep 30; done
timeout 900 python bench.py > $P/bench_r5night_0.json 2>/dev/null || true
tail -1 $P/bench_r5night_0.json

# --- 1a. unet on the ensemble pipeline (new stack family) ---
if ! past "$NO_NEW_TRAIN" && [ ! -f $P/jax_unet_ensemble_cos300_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine" \
    timeout 3300 python tools/parity_run.py --stack jax \
    --model unet --pipeline ensemble --epochs 300 \
    --tag cos300 --save-preds >> $P/round5_night.log 2>&1 || true
fi

# --- 1b. 6th cnn_transformer seed ---
if ! past "$NO_NEW_TRAIN" && [ ! -f $P/jax_cnn_transformer_ensemble_cos300seed45_e300.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=45" \
    timeout 3000 python tools/parity_run.py --stack jax \
    --model cnn_transformer --pipeline ensemble --epochs 300 \
    --tag cos300seed45 --save-preds >> $P/round5_night.log 2>&1 || true
fi

# --- 1c. seq12 flagship diversity member (e150 fits the window; e300 does not) ---
if ! past "$NO_NEW_TRAIN" && [ ! -f $P/jax_unet_convlstm_attention_final_seq12cos200_e200.json ]; then
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=46" \
    timeout 3600 python tools/parity_run.py --stack jax \
    --model unet_convlstm_attention --pipeline final --epochs 200 --seq-len 12 \
    --tag seq12cos200 --save-preds >> $P/round5_night.log 2>&1 || true
fi

# --- 2. forcing-only stack refit with everything that exists now ---
M12="$P/jax_cnn_transformer_ensemble_cos300seed42_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300seed43_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300seed44_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300wide_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300wide256_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300w384_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_calib300w256_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_base24cos300_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_cos300seed42_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_cos300seed43_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_cos300seed44_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_cos300seed45_e300_valpreds.npz"
EXTRA=""
for f in $P/jax_unet_ensemble_cos300_e300_valpreds.npz \
         $P/jax_cnn_transformer_ensemble_cos300seed45_e300_valpreds.npz \
         $P/jax_unet_convlstm_attention_final_seq12cos200_e200_valpreds.npz; do
  [ -f "$f" ] && EXTRA="$EXTRA $f"
done
if [ -n "$EXTRA" ]; then
  timeout 2700 nice -19 python tools/ensemble_eval.py --weighted --holdout --align-tail \
    $M12 $EXTRA > $P/ensemble_crossR5_forcing.json 2>$P/ensemble_crossR5_forcing.err || true
  tail -1 $P/ensemble_crossR5_forcing.json
fi

# --- 3. two-point-slope HBM probe (VERDICT r4 item 5) ---
if ! past "$ROOFLINE_BY"; then
  CLIMATE_TPU_BENCH_ROOFLINE=1 CLIMATE_TPU_BENCH_FUSED=0 \
    timeout 1800 python bench.py --measure > $P/roofline_rerun_r5.log 2>&1 || true
  tail -2 $P/roofline_rerun_r5.log
  cat $P/hbm_roofline.json
fi

# --- FINAL: driver-visible artifacts proven healthy ---
timeout 900 python bench.py > $P/bench_r5night_1.json 2>/dev/null || true
tail -1 $P/bench_r5night_1.json
timeout 900 python bench.py > $P/bench_r5night_2.json 2>/dev/null || true
tail -1 $P/bench_r5night_2.json
bash tools/round_end_check.sh >> $P/round5_night.log 2>&1 && echo "ROUND_END_CHECK PASS" || echo "ROUND_END_CHECK FAIL"
echo "NIGHT_QUEUE_R5 DONE"
