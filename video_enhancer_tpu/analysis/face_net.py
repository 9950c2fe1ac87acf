"""Tiny anchor-free neural face detector (CenterNet-style).

The reference chains four real detectors (reference
models/enhancement/face_restoration_expert.py:490-577: MediaPipe ->
face_recognition -> Haar -> MTCNN) — none of which exist in this image.
This module supplies the learned tier of our chain: a fully-convolutional
center-heatmap detector over a fixed 128x128 input (static shapes, conv
FLOPs on the MXU), trained on procedural synthetic scenes
(train/face_detector.py) and bundled as ``weights/face_detector.npz``.

Head layout per stride-8 grid cell: 1 center-heatmap logit, 2 log-sizes
(grid units), 2 center offsets (cell fractions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from ..ops import pixel_unshuffle

__all__ = ["init", "apply", "decode", "detect", "INPUT_SIZE", "STRIDE"]

INPUT_SIZE = 128
STRIDE = 8  # s2d(2) + two stride-2 convs
GRID = INPUT_SIZE // STRIDE


def init(key, dim: int = 32):
    ks = jax.random.split(key, 6)
    return {
        "stem": nn.conv2d_init(ks[0], 3, 3, 12, dim),          # 64x64
        "down1": nn.conv2d_init(ks[1], 3, 3, dim, dim * 2),    # 32x32
        "down2": nn.conv2d_init(ks[2], 3, 3, dim * 2, dim * 4),  # 16x16
        "body1": nn.conv2d_init(ks[3], 3, 3, dim * 4, dim * 4),
        "body2": nn.conv2d_init(ks[4], 3, 3, dim * 4, dim * 4),
        "head": nn.conv2d_init(ks[5], 1, 1, dim * 4, 5),
    }


def apply(p, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 128, 128, 3) in [0,1] -> (B, 16, 16, 5) raw head outputs."""
    h = pixel_unshuffle(x, 2)
    h = jax.nn.silu(nn.conv2d_apply(p["stem"], h))
    h = jax.nn.silu(nn.conv2d_apply(p["down1"], h, stride=2))
    h = jax.nn.silu(nn.conv2d_apply(p["down2"], h, stride=2))
    h = jax.nn.silu(nn.conv2d_apply(p["body1"], h)) + h
    h = jax.nn.silu(nn.conv2d_apply(p["body2"], h)) + h
    return nn.conv2d_apply(p["head"], h)


def decode(out: np.ndarray, threshold: float = 0.45,
           max_faces: int = 8) -> list[tuple[float, float, float, float, float]]:
    """One head output (16, 16, 5) -> [(x, y, w, h, score)] in 128-space.

    3x3 local-max suppression on the sigmoid heatmap (the standard
    maxpool-as-NMS trick), then top-K above threshold.
    """
    logits = out[..., 0]
    heat = 1.0 / (1.0 + np.exp(-logits))
    padded = np.pad(heat, 1, constant_values=-1.0)
    windows = np.lib.stride_tricks.sliding_window_view(padded, (3, 3))
    keep = (heat >= windows.max(axis=(2, 3)) - 1e-9) & (heat >= threshold)
    ys, xs = np.nonzero(keep)
    order = np.argsort(heat[ys, xs])[::-1][:max_faces]
    boxes = []
    for i in order:
        gy, gx = int(ys[i]), int(xs[i])
        off = out[gy, gx, 3:5]
        cx = (gx + float(np.clip(off[0], 0.0, 1.0))) * STRIDE
        cy = (gy + float(np.clip(off[1], 0.0, 1.0))) * STRIDE
        bw = float(np.exp(np.clip(out[gy, gx, 1], -4.0, 4.0))) * STRIDE
        bh = float(np.exp(np.clip(out[gy, gx, 2], -4.0, 4.0))) * STRIDE
        boxes.append((cx - bw / 2, cy - bh / 2, bw, bh,
                      float(heat[gy, gx])))
    return boxes


def detect(params, frame: np.ndarray, forward=None,
           threshold: float = 0.45) -> list[tuple[int, int, int, int]]:
    """RGB uint8 frame of any size -> [(x, y, w, h)] int boxes."""
    import cv2

    h, w = frame.shape[:2]
    inp = cv2.resize(frame, (INPUT_SIZE, INPUT_SIZE),
                     interpolation=cv2.INTER_AREA)
    x = jnp.asarray(inp[None].astype(np.float32) / 255.0)
    fwd = forward if forward is not None else jax.jit(apply)
    out = np.asarray(fwd(params, x))[0]
    sx, sy = w / INPUT_SIZE, h / INPUT_SIZE
    boxes = []
    for bx, by, bw, bh, _ in decode(out, threshold=threshold):
        x0 = int(max(bx * sx, 0))
        y0 = int(max(by * sy, 0))
        boxes.append((x0, y0,
                      int(min(bw * sx, w - x0)), int(min(bh * sy, h - y0))))
    return [b for b in boxes if b[2] > 1 and b[3] > 1]
