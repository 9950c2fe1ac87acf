#!/bin/bash
# Serial retrain of every bundled model on the widened content+degradation
# distribution (train/data.py modes 0-3 + train/cli.py mixed bank).
# One model at a time: single TPU chip. Usage: scripts/retrain_all.sh [log]
set -u
LOG="${1:-/tmp/retrain_r4.log}"
W=video_enhancer_tpu/weights
CK=/tmp/ckpt_r4

train() { # name steps extra...
  local name="$1" steps="$2"; shift 2
  echo "=== $name (steps=$steps) $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 7200 python -m video_enhancer_tpu.train.cli \
    --model "$name" --steps "$steps" --lr 1.5e-4 \
    --ckpt-dir "$CK/$name" "$@" >> "$LOG" 2>&1
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
}

train vsrm           2500 --scale 4 --init-npz $W/vsrm_4x.npz           --export $W/vsrm_4x.npz
train fast_mamba_vsr 2500 --scale 4 --init-npz $W/fast_mamba_vsr_4x.npz --export $W/fast_mamba_vsr_4x.npz
train seedvr2        2500 --scale 1 --init-npz $W/seedvr2_1x.npz        --export $W/seedvr2_1x.npz
train ditvr          2500 --scale 1 --heads 3 --init-npz $W/ditvr_1x.npz --export $W/ditvr_1x.npz
train rife           2000 --init-npz $W/rife.npz                        --export $W/rife.npz
train cnn_upscaler   1500 --scale 2 --init-npz $W/cnn_upscaler_2x.npz   --export $W/cnn_upscaler_2x.npz
train realesrgan     2500 --scale 4 --init-npz $W/realesrgan_4x.npz     --export $W/realesrgan_4x.npz
train rvrt           2000 --scale 4 --init-npz $W/rvrt_4x.npz           --export $W/rvrt_4x.npz
echo "=== ALL DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
# appended r4b: half-trunk latency preset (own ckpt dir: 3-block tree
# must not restore the 6-block checkpoint).
echo "=== realesrgan_fast (steps=2500) $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 7200 python -m video_enhancer_tpu.train.cli \
  --model realesrgan --steps 2500 --lr 2e-4 --scale 4 --layers 3 \
  --ckpt-dir "$CK/realesrgan_fast" --export $W/realesrgan_fast_4x.npz >> "$LOG" 2>&1
echo "=== realesrgan_fast done rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
# appended r4c: FMV SSD temporal-mixer preset (MXU-form recurrence,
# round-4 verdict item 2) — fresh tree, own variant weight file.
echo "=== fast_mamba_vsr[ssd] (steps=2500) $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 7200 python -m video_enhancer_tpu.train.cli \
  --model fast_mamba_vsr --steps 2500 --lr 2e-4 --scale 4 \
  --temporal-mixer ssd --ckpt-dir "$CK/fmv_ssd" \
  --export $W/fast_mamba_vsr_ssd_4x.npz >> "$LOG" 2>&1
echo "=== fast_mamba_vsr[ssd] done rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
