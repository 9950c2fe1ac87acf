#!/bin/bash
# Round-5c: alt-targeted retrains on the calibrated degradation MIXTURE
# (train/data.py pair_iterator defaults: 50% canonical / 30% always-compound
# chain / 20% wide, second-pass stack p=0.25). Motivation (measured, see
# BENCH_RESULTS.md round-5 log): warm chunks on the raw wide bank regressed
# four models and were reverted, while the one chunk that trained on the
# mixture (cnn_upscaler) improved BOTH eval families. Gate: dual-family
# (scripts/dualgate.py) — accept iff alt improves AND ind stays above the
# model's CI gate; otherwise auto-revert.
# One model at a time (single TPU chip); evals on CPU.
# Usage: scripts/retrain_r5c.sh [log]
set -u
LOG="${1:-/tmp/retrain_r5c.log}"
W=video_enhancer_tpu/weights
CK=/tmp/ckpt_r5c   # FRESH checkpoint roots: never resume the rejected
                   # round-5a chunks (those live under /tmp/ckpt_r5)

train() { # name budget_s steps extra...
  local name="$1" budget="$2" steps="$3"; shift 3
  echo "=== $name (steps=$steps budget=${budget}s) $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout $((budget + 600)) python -m video_enhancer_tpu.train.cli \
    --model "$name" --steps "$steps" --lr 1e-4 \
    --time-budget-s "$budget" \
    --ckpt-dir "$CK/$name" "$@" >> "$LOG" 2>&1
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
}

gated_train() { # eval_name npz_path ind_floor name budget steps extra...
  local ename="$1" npz="$2" floor="$3"; shift 3
  local snap="/tmp/pretrain_r5c_$ename.npz"
  cp -f "$npz" "$snap" 2>/dev/null || true
  train "$@"
  if [ -f "$snap" ]; then
    if ! VETPU_PLATFORM=cpu python scripts/dualgate.py \
        "$ename" "$snap" "$floor" >> "$LOG" 2>&1; then
      echo "=== $ename dual-gate: reverting npz ===" >> "$LOG"
      cp -f "$snap" "$npz"
    fi
  fi
}

# Closest-to-flip first. ind floors = tests/test_bundled_weights.py GATES.
gated_train fast_mamba_vsr $W/fast_mamba_vsr_4x.npz 0.5 \
  fast_mamba_vsr 1200 2500 --scale 4 \
  --init-npz $W/fast_mamba_vsr_4x.npz --export $W/fast_mamba_vsr_4x.npz
gated_train cnn_upscaler $W/cnn_upscaler_2x.npz 0.06 \
  cnn_upscaler 700 1500 --scale 2 \
  --init-npz $W/cnn_upscaler_2x.npz --export $W/cnn_upscaler_2x.npz
gated_train vsrm $W/vsrm_4x.npz 0.8 \
  vsrm 1200 2500 --scale 4 \
  --init-npz $W/vsrm_4x.npz --export $W/vsrm_4x.npz
gated_train rvrt $W/rvrt_4x.npz 0.5 \
  rvrt 1200 2000 --scale 4 \
  --init-npz $W/rvrt_4x.npz --export $W/rvrt_4x.npz
gated_train realesrgan_fast $W/realesrgan_fast_4x.npz 0.5 \
  realesrgan 1200 2000 --scale 4 --layers 3 \
  --init-npz $W/realesrgan_fast_4x.npz \
  --ckpt-dir "$CK/realesrgan_fast" --export $W/realesrgan_fast_4x.npz
gated_train realesrgan $W/realesrgan_4x.npz 0.8 \
  realesrgan 1200 2000 --scale 4 \
  --init-npz $W/realesrgan_4x.npz --export $W/realesrgan_4x.npz
echo "=== R5C DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
