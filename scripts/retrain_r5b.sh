#!/bin/bash
# Round-5 follow-up: seedvr2 chunks WITH the trainable-timestep fix
# (models/seedvr2.py round-5 gradient fix — the quality-conditioned shift
# trains for the first time here; chunks 1-2 ran before the fix landed).
# Gated like retrain_r5.sh. Usage: scripts/retrain_r5b.sh [budget_s] [log]
set -u
BUDGET="${1:-2700}"
LOG="${2:-/tmp/retrain_r5b.log}"
W=video_enhancer_tpu/weights
CK=/tmp/ckpt_r5

snap="/tmp/pretrain_r5b_seedvr2.npz"
cp -f "$W/seedvr2_1x.npz" "$snap"
echo "=== seedvr2 grad-fix chunk (budget=${BUDGET}s) $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout $((BUDGET + 600)) python -m video_enhancer_tpu.train.cli \
  --model seedvr2 --steps 99999 --lr 1.5e-4 --scale 1 \
  --time-budget-s "$BUDGET" \
  --init-npz "$W/seedvr2_1x.npz" --ckpt-dir "$CK/seedvr2" \
  --export "$W/seedvr2_1x.npz" >> "$LOG" 2>&1
echo "=== seedvr2 done rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
if ! VETPU_PLATFORM=cpu python -m video_enhancer_tpu.train.evalsuite \
    seedvr2 --compare-npz "$snap" >> "$LOG" 2>&1; then
  echo "=== seedvr2 eval regression: reverting npz ===" >> "$LOG"
  cp -f "$snap" "$W/seedvr2_1x.npz"
fi
echo "=== R5B DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
