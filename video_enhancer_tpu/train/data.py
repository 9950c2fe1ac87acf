"""Synthetic degradation training data.

VSR training pairs manufactured on the fly: HR crops from source frames
(any video, or the deterministic demo generator), degraded to LR by the
classic pipeline blur -> downscale -> noise -> (light) compression smear.
No dataset downloads (zero-egress environment); same philosophy as the
reference's synthetic-fixture strategy (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_pairs", "pair_iterator", "make_triplets",
           "triplet_iterator"]


def _degrade(hr: np.ndarray, scale: int, rng: np.random.Generator
             ) -> np.ndarray:
    import cv2

    t, h, w, _ = hr.shape
    lr = np.empty((t, h // scale, w // scale, 3), np.float32)
    sigma = rng.uniform(0.2, 1.6)
    noise_std = rng.uniform(0.0, 0.04)
    for i in range(t):
        f = cv2.GaussianBlur(hr[i], (5, 5), sigma)
        f = cv2.resize(f, (w // scale, h // scale),
                       interpolation=cv2.INTER_AREA)
        lr[i] = f
    lr += rng.normal(0, noise_std, lr.shape).astype(np.float32)
    if rng.random() < 0.5:  # light compression smear
        for i in range(t):
            small = cv2.resize(lr[i], (lr.shape[2] * 3 // 4,
                                       lr.shape[1] * 3 // 4))
            lr[i] = cv2.resize(small, (lr.shape[2], lr.shape[1]),
                               interpolation=cv2.INTER_LINEAR)
    return np.clip(lr, 0.0, 1.0)


def make_pairs(frames: np.ndarray, batch: int, clip_len: int,
               crop: int, scale: int, seed: int = 0) -> dict:
    """Sample a batch of (lr, hr) clip pairs from source frames.

    frames: (N, H, W, 3) uint8 or float. Returns numpy dict
    {"lr": (B,T,h,w,3), "hr": (B,T,H,W,3)} float32 in [0,1].
    """
    rng = np.random.default_rng(seed)
    if frames.dtype == np.uint8:
        frames = frames.astype(np.float32) / 255.0
    n, H, W, _ = frames.shape
    assert n >= clip_len, "need at least clip_len source frames"
    hr = np.empty((batch, clip_len, crop, crop, 3), np.float32)
    lr = np.empty((batch, clip_len, crop // scale, crop // scale, 3),
                  np.float32)
    for b in range(batch):
        t0 = rng.integers(0, n - clip_len + 1)
        y = rng.integers(0, max(H - crop, 1))
        x = rng.integers(0, max(W - crop, 1))
        clip_hr = frames[t0:t0 + clip_len, y:y + crop, x:x + crop]
        hr[b] = clip_hr
        lr[b] = _degrade(clip_hr, scale, rng)
    return {"lr": lr, "hr": hr}


def pair_iterator(frames: np.ndarray, batch: int, clip_len: int, crop: int,
                  scale: int, seed: int = 0):
    """Infinite iterator of training batches."""
    step = 0
    while True:
        yield make_pairs(frames, batch, clip_len, crop, scale,
                         seed=seed + step)
        step += 1


def make_triplets(frames: np.ndarray, batch: int, crop: int,
                  seed: int = 0) -> dict:
    """Frame-interpolation triplets: ``lr`` = the two endpoint frames
    (B, 2, c, c, 3), ``hr`` = the true middle frame (B, 1, c, c, 3)."""
    rng = np.random.default_rng(seed)
    if frames.dtype == np.uint8:
        frames = frames.astype(np.float32) / 255.0
    n, H, W, _ = frames.shape
    assert n >= 3, "need at least 3 source frames"
    lr = np.empty((batch, 2, crop, crop, 3), np.float32)
    hr = np.empty((batch, 1, crop, crop, 3), np.float32)
    for b in range(batch):
        t0 = rng.integers(0, n - 2)
        y = rng.integers(0, max(H - crop, 1))
        x = rng.integers(0, max(W - crop, 1))
        win = frames[t0:t0 + 3, y:y + crop, x:x + crop]
        lr[b, 0], lr[b, 1] = win[0], win[2]
        hr[b, 0] = win[1]
    return {"lr": lr, "hr": hr}


def triplet_iterator(frames: np.ndarray, batch: int, crop: int,
                     seed: int = 0):
    step = 0
    while True:
        yield make_triplets(frames, batch, crop, seed=seed + step)
        step += 1
