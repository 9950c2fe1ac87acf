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

# Eval-gated retrain: snapshot the bundled npz, train, then auto-revert if
# the new export measures WORSE on the held-out ind family. Round-4
# measured need: warm retrains with healthy-looking train loss shipped
# eval regressions twice (cnn_upscaler +0.087 -> +0.071; rife +1.93 ->
# -1.26 on a flat plateau).
gated_train() { # eval_name npz_path name steps extra...
  local ename="$1" npz="$2"; shift 2
  local snap="/tmp/pretrain_$ename.npz"
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

gated_train vsrm $W/vsrm_4x.npz vsrm 2500 --scale 4 --init-npz $W/vsrm_4x.npz           --export $W/vsrm_4x.npz
gated_train fast_mamba_vsr $W/fast_mamba_vsr_4x.npz fast_mamba_vsr 2500 --scale 4 --init-npz $W/fast_mamba_vsr_4x.npz --export $W/fast_mamba_vsr_4x.npz
gated_train seedvr2 $W/seedvr2_1x.npz seedvr2 2500 --scale 1 --init-npz $W/seedvr2_1x.npz        --export $W/seedvr2_1x.npz
gated_train ditvr $W/ditvr_1x.npz ditvr 2500 --scale 1 --heads 3 --init-npz $W/ditvr_1x.npz --export $W/ditvr_1x.npz
gated_train rife $W/rife.npz rife 2000 --init-npz $W/rife.npz                        --export $W/rife.npz
gated_train cnn_upscaler $W/cnn_upscaler_2x.npz cnn_upscaler 1500 --scale 2 --init-npz $W/cnn_upscaler_2x.npz   --export $W/cnn_upscaler_2x.npz
gated_train realesrgan $W/realesrgan_4x.npz realesrgan 2500 --scale 4 --init-npz $W/realesrgan_4x.npz     --export $W/realesrgan_4x.npz
gated_train rvrt $W/rvrt_4x.npz rvrt 2000 --scale 4 --init-npz $W/rvrt_4x.npz           --export $W/rvrt_4x.npz
echo "=== ALL DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
# Latency presets (half-trunk Real-ESRGAN; FMV SSD temporal mixer — own
# ckpt dirs + variant weight files so one architecture's checkpoint never
# restores into another). Gated like the rest once a bundled npz exists.
gated_train realesrgan_fast $W/realesrgan_fast_4x.npz \
  realesrgan 2500 --scale 4 --layers 3 \
  --ckpt-dir "$CK/realesrgan_fast" --export $W/realesrgan_fast_4x.npz
gated_train fast_mamba_vsr_ssd $W/fast_mamba_vsr_ssd_4x.npz \
  fast_mamba_vsr 2500 --scale 4 --temporal-mixer ssd \
  --ckpt-dir "$CK/fmv_ssd" --export $W/fast_mamba_vsr_ssd_4x.npz
