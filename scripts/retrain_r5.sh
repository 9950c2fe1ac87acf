#!/bin/bash
# Round-5 retrain schedule (verdict item 2): drive every routable model to
# positive gated gains on the widened eval, in priority order so an early
# stop still fixes the worst defects first. Trains on the round-5 widened
# bank: wide-severity degradations (train/data.py _degrade wide=True),
# compound chains (p=0.35), and the mode-4 flow-field content family.
# One model at a time (single TPU chip); evals run on CPU.
# Usage: scripts/retrain_r5.sh [log]
set -u
LOG="${1:-/tmp/retrain_r5.log}"
W=video_enhancer_tpu/weights
CK=/tmp/ckpt_r5

train() { # name budget_s steps extra...
  local name="$1" budget="$2" steps="$3"; shift 3
  echo "=== $name (steps=$steps budget=${budget}s) $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout $((budget + 600)) python -m video_enhancer_tpu.train.cli \
    --model "$name" --steps "$steps" --lr 1.5e-4 \
    --time-budget-s "$budget" \
    --ckpt-dir "$CK/$name" "$@" >> "$LOG" 2>&1
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
}

# Eval-gated retrain (round-4 discipline): snapshot the bundled npz, train,
# auto-revert if the new export measures WORSE on the held-out ind family.
gated_train() { # eval_name npz_path name budget steps extra...
  local ename="$1" npz="$2"; shift 2
  local snap="/tmp/pretrain_r5_$ename.npz"
  cp -f "$npz" "$snap" 2>/dev/null || true
  train "$@"
  if [ -f "$snap" ]; then
    if ! VETPU_PLATFORM=cpu python -m video_enhancer_tpu.train.evalsuite \
        "$ename" --compare-npz "$snap" >> "$LOG" 2>&1; then
      echo "=== $ename eval regression: reverting npz ===" >> "$LOG"
      cp -f "$snap" "$npz"
    fi
  fi
}

# Priority 1: seedvr2 — measured NEGATIVE (-2.73 ind); two gated chunks so a
# late regression reverts to the mid-point export, with a train-loss plateau
# caught by the gate rather than shipped.
gated_train seedvr2 $W/seedvr2_1x.npz seedvr2 3600 4000 --scale 1 \
  --init-npz $W/seedvr2_1x.npz --export $W/seedvr2_1x.npz
# chunk 2 RESUMES from the chunk-1 checkpoint (step count continues), so
# its --steps is the cumulative target.
gated_train seedvr2 $W/seedvr2_1x.npz seedvr2 3600 8000 --scale 1 \
  --init-npz $W/seedvr2_1x.npz --export $W/seedvr2_1x.npz

# Priority 2: rife — widened-distribution retrain (pending since round 4).
gated_train rife $W/rife.npz rife 1500 2500 \
  --init-npz $W/rife.npz --export $W/rife.npz

# Priority 3: the SSM tree back toward round-3 levels + alt-positive.
gated_train vsrm $W/vsrm_4x.npz vsrm 1500 2500 --scale 4 \
  --init-npz $W/vsrm_4x.npz --export $W/vsrm_4x.npz
gated_train fast_mamba_vsr $W/fast_mamba_vsr_4x.npz fast_mamba_vsr 1500 2500 \
  --scale 4 --init-npz $W/fast_mamba_vsr_4x.npz --export $W/fast_mamba_vsr_4x.npz

# fmv_ssd: RETIRED round 5 — interleaved A/B measured the ssd mixer
# SLOWER than the ssm scan at both serving shapes (T=8: 175.2 vs 103.4 ms;
# T=16: 317.5 vs 209.0 ms medians, scripts/ab_fmv_tmix.py) and its quality
# never passed +0.04 dB. No further training; policy disables the preset.

# Priority 5: the rest of the zoo on the widened bank.
gated_train cnn_upscaler $W/cnn_upscaler_2x.npz cnn_upscaler 700 1500 \
  --scale 2 --init-npz $W/cnn_upscaler_2x.npz --export $W/cnn_upscaler_2x.npz
gated_train ditvr $W/ditvr_1x.npz ditvr 1200 2000 --scale 1 --heads 3 \
  --init-npz $W/ditvr_1x.npz --export $W/ditvr_1x.npz
gated_train realesrgan $W/realesrgan_4x.npz realesrgan 1200 2000 --scale 4 \
  --init-npz $W/realesrgan_4x.npz --export $W/realesrgan_4x.npz
gated_train realesrgan_fast $W/realesrgan_fast_4x.npz realesrgan 1200 2000 \
  --scale 4 --layers 3 --init-npz $W/realesrgan_fast_4x.npz \
  --ckpt-dir "$CK/realesrgan_fast" --export $W/realesrgan_fast_4x.npz
gated_train rvrt $W/rvrt_4x.npz rvrt 1200 2000 --scale 4 \
  --init-npz $W/rvrt_4x.npz --export $W/rvrt_4x.npz

echo "=== ALL DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
