"""Cross-generator held-out evaluation data (round-4 verdict item 3).

Every bundled-weight quality number used to come from ``io/demo.py`` frames
degraded by ``train/data._degrade`` — the same generators the models were
trained on, held out only by sampling seed. This module is a SECOND
synthetic family sharing **nothing structural** with the training one:

==============  ============================  ==============================
Component       training family               this family
==============  ============================  ==============================
texture         linear gradients + flat       multi-octave value noise,
                shapes + text overlay         Voronoi cells, rotated stripes
motion          orbiting circle, growing      global affine pan/zoom/rotate
                rectangle (local, additive)   of a texture field + sinusoidal
                                              local warp (resampling motion)
blur            Gaussian 5x5                  linear motion blur (random
                                              angle/length)
downsample      cv2.INTER_AREA                cv2.INTER_LINEAR
noise           additive Gaussian             5-bit quantization + uniform
compression     down/up resize smear          real JPEG encode/decode
==============  ============================  ==============================

Matches the reference's quality-gate intent (reference
config/policy_v1.yaml:236-251) with an eval set a training run has never
seen structurally. Pure numpy + cv2, deterministic per seed.
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_alt_frames", "degrade_alt", "make_alt_pairs",
           "make_alt_triplets"]


def _value_noise(rng: np.random.Generator, h: int, w: int,
                 octaves: int = 4) -> np.ndarray:
    """Multi-octave smooth value noise in [0, 1], (h, w) float32."""
    import cv2

    img = np.zeros((h, w), np.float32)
    amp = 1.0
    for o in range(octaves):
        gh = max(2, h // (1 << (octaves - o + 1)))
        gw = max(2, w // (1 << (octaves - o + 1)))
        g = rng.random((gh, gw)).astype(np.float32)
        img += amp * cv2.resize(g, (w, h), interpolation=cv2.INTER_CUBIC)
        amp *= 0.55
    img -= img.min()
    return img / max(img.max(), 1e-6)


def _voronoi(rng: np.random.Generator, h: int, w: int,
             cells: int = 24) -> np.ndarray:
    """Voronoi cell map in [0, 1] — hard edges, piecewise-flat regions."""
    pts = np.stack([rng.uniform(0, h, cells), rng.uniform(0, w, cells)],
                   axis=1).astype(np.float32)
    vals = rng.random(cells).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    d = ((yy[..., None] - pts[:, 0]) ** 2
         + (xx[..., None] - pts[:, 1]) ** 2)
    return vals[np.argmin(d, axis=-1)]


def _stripes(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Rotated sinusoidal stripes — directional high-frequency content."""
    theta = rng.uniform(0, np.pi)
    freq = rng.uniform(0.05, 0.25)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    phase = (yy * np.sin(theta) + xx * np.cos(theta)) * freq
    return (0.5 + 0.5 * np.sin(2 * np.pi * phase)).astype(np.float32)


def make_alt_frames(frames: int = 24, size_hw: tuple[int, int] = (256, 256),
                    seed: int = 0) -> np.ndarray:
    """(frames, h, w, 3) uint8: affine-moving composite texture field.

    The camera path (translate + zoom + rotate) resamples a 1.6x-oversized
    static field, so motion is *resampling* motion (every pixel moves),
    unlike the training family's static background + moving foreground.
    A small sinusoidal local warp adds non-rigid deformation.
    """
    import cv2

    h, w = size_hw
    rng = np.random.default_rng(seed)
    fh, fw = int(h * 1.6), int(w * 1.6)
    field = np.stack([
        0.6 * _value_noise(rng, fh, fw) + 0.4 * _voronoi(rng, fh, fw),
        0.7 * _value_noise(rng, fh, fw) + 0.3 * _stripes(rng, fh, fw),
        0.5 * _voronoi(rng, fh, fw) + 0.5 * _stripes(rng, fh, fw),
    ], axis=-1).astype(np.float32)

    # Camera path parameters.
    dx_amp = rng.uniform(0.05, 0.15) * fw
    dy_amp = rng.uniform(0.05, 0.15) * fh
    rot_amp = rng.uniform(2.0, 8.0)          # degrees
    zoom_amp = rng.uniform(0.03, 0.10)
    warp_amp = rng.uniform(0.5, 2.0)         # px
    warp_freq = rng.uniform(1.0, 3.0)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = np.empty((frames, h, w, 3), np.uint8)
    cx, cy = fw / 2.0, fh / 2.0
    for t in range(frames):
        ph = 2 * np.pi * t / max(frames, 1)
        ang = rot_amp * np.sin(ph)
        zoom = 1.0 + zoom_amp * np.sin(ph * 0.5)
        M = cv2.getRotationMatrix2D((cx, cy), ang, zoom)
        M[0, 2] += dx_amp * np.sin(ph) - (fw - w) / 2.0
        M[1, 2] += dy_amp * np.cos(ph) - (fh - h) / 2.0
        frame = cv2.warpAffine(field, M, (w, h), flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_REFLECT)
        # Non-rigid sinusoidal warp (breathing deformation).
        mx = (xx + warp_amp * np.sin(2 * np.pi * warp_freq * yy / h + ph)
              ).astype(np.float32)
        my = (yy + warp_amp * np.cos(2 * np.pi * warp_freq * xx / w + ph)
              ).astype(np.float32)
        frame = cv2.remap(frame, mx, my, cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT)
        out[t] = np.clip(frame * 255.0, 0, 255).astype(np.uint8)
    return out


def _motion_kernel(rng: np.random.Generator, ksize: int = 7) -> np.ndarray:
    """Normalized linear motion-blur kernel at a random angle/length."""
    import cv2

    k = np.zeros((ksize, ksize), np.float32)
    theta = rng.uniform(0, np.pi)
    length = rng.uniform(2.0, ksize - 1.0)
    c = (ksize - 1) / 2.0
    p0 = (int(round(c - np.cos(theta) * length / 2)),
          int(round(c - np.sin(theta) * length / 2)))
    p1 = (int(round(c + np.cos(theta) * length / 2)),
          int(round(c + np.sin(theta) * length / 2)))
    cv2.line(k, p0, p1, 1.0, 1)
    s = k.sum()
    if s <= 0:
        k[int(c), int(c)] = 1.0
        s = 1.0
    return k / s


def degrade_alt(hr: np.ndarray, scale: int,
                rng: np.random.Generator) -> np.ndarray:
    """HR (t, h, w, 3) float32 [0,1] -> LR via the ALT degradation chain:
    motion blur -> bilinear downsample -> 5-bit quantization + uniform
    noise -> real JPEG round-trip."""
    import cv2

    t, h, w, _ = hr.shape
    lh, lw = h // scale, w // scale
    k = _motion_kernel(rng)
    jpeg_q = int(rng.integers(35, 75))
    lr = np.empty((t, lh, lw, 3), np.float32)
    for i in range(t):
        f = cv2.filter2D(hr[i], -1, k)
        f = cv2.resize(f, (lw, lh), interpolation=cv2.INTER_LINEAR)
        # 5-bit quantization + uniform dither noise.
        f = np.floor(np.clip(f, 0, 1) * 31.0 + 0.5) / 31.0
        f = f + rng.uniform(-0.015, 0.015, f.shape).astype(np.float32)
        u8 = np.clip(f * 255.0, 0, 255).astype(np.uint8)
        ok, enc = cv2.imencode(".jpg", u8,
                               [cv2.IMWRITE_JPEG_QUALITY, jpeg_q])
        if ok:
            u8 = cv2.imdecode(enc, cv2.IMREAD_COLOR)
        lr[i] = u8.astype(np.float32) / 255.0
    return np.clip(lr, 0.0, 1.0)


def make_alt_pairs(frames: np.ndarray, batch: int, clip_len: int, crop: int,
                   scale: int, seed: int = 0) -> dict:
    """Cross-generator (lr, hr) clip pairs; same dict contract as
    ``train.data.make_pairs`` so eval harnesses can swap families."""
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
        lr[b] = degrade_alt(clip_hr, scale, rng)
    return {"lr": lr, "hr": hr}


def make_alt_triplets(frames: np.ndarray, batch: int, crop: int,
                      seed: int = 0) -> dict:
    """Interpolation triplets from the alt motion family."""
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
