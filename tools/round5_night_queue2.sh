#!/bin/bash
# Round-5 night queue, take 2. Take 1 (round5_night_queue.sh) had a date
# boundary bug: `date -u -d '01:25'` resolved to YESTERDAY's 01:25 when the
# script started at 23:27, so every guard read "past" and all training jobs
# were skipped. Guards here are ABSOLUTE epoch seconds computed for tonight.
# Sequencing lesson applied: the cheap driver-visible artifact (HBM probe,
# seconds of compile) goes FIRST; the one training job that fits the window
# (unet on the ENSEMBLE pipeline — the third stack family) runs next with a
# hard cap; bench + round_end_check close the window no matter what.
cd "$(dirname "$0")/.."
set -x
P=tools/parity
NO_NEW_TRAIN=1787277000   # 2026-08-21 01:50 UTC
FINAL_AT=1787277900       # 2026-08-21 02:05 UTC — start FINAL block by here
past() { [ "$(date -u +%s)" -ge "$1" ]; }

# wait for the in-flight bench child (from queue take 1) to release the TPU
while ps aux | grep -q "[b]ench.py"; do
  sleep 15
done
sleep 5

# --- 1. two-point HBM probe: compiles in seconds, closes VERDICT item 5 ---
timeout 600 python tools/hbm_probe.py > $P/hbm_probe_r5.log 2>&1 || true
tail -1 $P/hbm_probe_r5.log

# --- 2. unet on the ensemble pipeline (new stack family), capped to leave
#        room for the FINAL block ---
if ! past "$NO_NEW_TRAIN" && [ ! -f $P/jax_unet_ensemble_cos300_e300.json ]; then
  BUDGET=$(( FINAL_AT - $(date -u +%s) ))
  [ "$BUDGET" -gt 300 ] && \
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine" \
    timeout "$BUDGET" python tools/parity_run.py --stack jax \
    --model unet --pipeline ensemble --epochs 300 \
    --tag cos300 --save-preds >> $P/round5_night.log 2>&1 || true
fi

# --- 3. 6th cnn_transformer seed, only if a big margin remains ---
if [ $(( FINAL_AT - $(date -u +%s) )) -gt 2100 ] && [ ! -f $P/jax_cnn_transformer_ensemble_cos300seed45_e300.json ]; then
  BUDGET=$(( FINAL_AT - $(date -u +%s) ))
  PARITY_EXTRA_OVERRIDES="training.lr_schedule=cosine seed=45" \
    timeout "$BUDGET" python tools/parity_run.py --stack jax \
    --model cnn_transformer --pipeline ensemble --epochs 300 \
    --tag cos300seed45 --save-preds >> $P/round5_night.log 2>&1 || true
fi

# --- 4. extended-calibration refit including whatever landed (CPU, nice) ---
M12="$P/jax_cnn_transformer_ensemble_cos300seed42_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300seed43_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300seed44_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300wide_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300wide256_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_cos300w384_e300_valpreds.npz $P/jax_cnn_transformer_ensemble_calib300w256_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_base24cos300_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_cos300seed42_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_cos300seed43_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_cos300seed44_e300_valpreds.npz $P/jax_unet_convlstm_attention_final_cos300seed45_e300_valpreds.npz"
EXTRA=""
for f in $P/jax_unet_ensemble_cos300_e300_valpreds.npz \
         $P/jax_cnn_transformer_ensemble_cos300seed45_e300_valpreds.npz; do
  [ -f "$f" ] && EXTRA="$EXTRA $f"
done
if [ -n "$EXTRA" ]; then
  nohup nice -19 python tools/stack_calibrate2.py --bands 6 $M12 $EXTRA \
    > $P/stack_calib2_crossR5.json 2> $P/stack_calib2_crossR5.err &
  echo "crossR5 extended refit launched (pid $!)"
  nohup nice -19 python tools/ensemble_eval.py --weighted --holdout --align-tail \
    $M12 $EXTRA > $P/ensemble_crossR5_forcing.json 2>$P/ensemble_crossR5_forcing.err &
  echo "crossR5 scalar refit launched (pid $!)"
fi

# --- FINAL: driver-visible artifacts proven healthy ---
timeout 900 python bench.py > $P/bench_r5night_1.json 2>/dev/null || true
tail -1 $P/bench_r5night_1.json
timeout 900 python bench.py > $P/bench_r5night_2.json 2>/dev/null || true
tail -1 $P/bench_r5night_2.json
echo "NIGHT_QUEUE2_R5 DONE"
