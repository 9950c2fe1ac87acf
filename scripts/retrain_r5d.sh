#!/bin/bash
# Round-5d: train THROUGH the served calibrated output strength
# (train/cli.py --through-calibration, runtime/calibration.py). Motivation:
# the calibration sweep moved every served model to its measured pareto
# point but costs ind (vsrm +0.846 raw -> +0.438 served); training the
# blended objective directly lets the model re-optimize ind AT the served
# operating point — the seedvr2 pattern (its +0.451 ind is trained through
# its internal s=0.2 blend) generalized to the zoo.
# Gate: scripts/paretogate.py — accept iff both CI floors hold AND
# ind+alt improves vs the pre-train snapshot; auto-revert otherwise.
# One model at a time (single TPU chip); evals on CPU.
# Usage: scripts/retrain_r5d.sh [log]
set -u
LOG="${1:-/tmp/retrain_r5d.log}"
W=video_enhancer_tpu/weights
CK=/tmp/ckpt_r5d   # fresh roots: never resume rejected r5a/r5c chunks

train() { # name budget_s steps extra...
  local name="$1" budget="$2" steps="$3"; shift 3
  echo "=== $name (steps=$steps budget=${budget}s) $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout $((budget + 600)) python -m video_enhancer_tpu.train.cli \
    --model "$name" --steps "$steps" --lr 1e-4 \
    --time-budget-s "$budget" \
    --ckpt-dir "$CK/$name" "$@" >> "$LOG" 2>&1
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
}

gated_train() { # eval_name npz_path ind_floor alt_floor name budget steps extra...
  local ename="$1" npz="$2" ind_floor="$3" alt_floor="$4"; shift 4
  local snap="/tmp/pretrain_r5d_$ename.npz"
  cp -f "$npz" "$snap" 2>/dev/null || true
  train "$@" --through-calibration "$ename"
  if [ -f "$snap" ]; then
    if ! VETPU_PLATFORM=cpu python scripts/paretogate.py \
        "$ename" "$snap" "$ind_floor" "$alt_floor" >> "$LOG" 2>&1; then
      echo "=== $ename pareto-gate: reverting npz ===" >> "$LOG"
      cp -f "$snap" "$npz"
    fi
  fi
}

# Floors = tests/test_bundled_weights.py GATES (ind, alt). Weakest-ind and
# widest-headroom (served ind far below raw ind) first.
gated_train vsrm $W/vsrm_4x.npz 0.3 0.0 \
  vsrm 1200 2500 --scale 4 \
  --init-npz $W/vsrm_4x.npz --export $W/vsrm_4x.npz
gated_train rvrt $W/rvrt_4x.npz 0.2 0.0 \
  rvrt 1200 2000 --scale 4 \
  --init-npz $W/rvrt_4x.npz --export $W/rvrt_4x.npz
gated_train realesrgan_fast $W/realesrgan_fast_4x.npz 0.25 0.0 \
  realesrgan 1200 2000 --scale 4 --layers 3 \
  --init-npz $W/realesrgan_fast_4x.npz \
  --ckpt-dir "$CK/realesrgan_fast" --export $W/realesrgan_fast_4x.npz
gated_train fast_mamba_vsr $W/fast_mamba_vsr_4x.npz 0.3 0.0 \
  fast_mamba_vsr 1200 2500 --scale 4 \
  --init-npz $W/fast_mamba_vsr_4x.npz --export $W/fast_mamba_vsr_4x.npz
gated_train cnn_upscaler $W/cnn_upscaler_2x.npz 0.06 -0.15 \
  cnn_upscaler 700 1500 --scale 2 \
  --init-npz $W/cnn_upscaler_2x.npz --export $W/cnn_upscaler_2x.npz
gated_train ditvr $W/ditvr_1x.npz 1.0 -1.6 \
  ditvr 1200 2000 --scale 1 --heads 3 \
  --init-npz $W/ditvr_1x.npz --export $W/ditvr_1x.npz
gated_train rife $W/rife.npz 1.4 -0.45 \
  rife 1200 2000 \
  --init-npz $W/rife.npz --export $W/rife.npz
gated_train realesrgan $W/realesrgan_4x.npz 0.5 -0.15 \
  realesrgan 1200 2000 --scale 4 \
  --init-npz $W/realesrgan_4x.npz --export $W/realesrgan_4x.npz
echo "=== R5D DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
