"""Degradation scoring ops — the router's analysis graph, on device.

The reference computes these per-frame with cv2/numpy on the host
(reference models/analysis/degradation_router.py:149-345). Here all five
degradation scores + content stats run as one jitted graph over the sampled
frame stack: 8x8-block DCT via matmuls (MXU), Laplacian/Gaussian via convs,
histograms via vectorized comparisons.

All inputs are ``(T, H, W, 3)`` float32 RGB in [0, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "degradation_scores",
    "compression_score",
    "blur_score",
    "low_light_score",
    "noise_score",
    "temporal_score",
]


def _luma(frames: jnp.ndarray) -> jnp.ndarray:
    """Rec.601 luma, (T, H, W)."""
    r, g, b = frames[..., 0], frames[..., 1], frames[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


@functools.lru_cache(maxsize=1)
def _dct8_matrix() -> np.ndarray:
    k = np.arange(8)
    n = np.arange(8)
    d = np.cos(np.pi * (2 * n[None, :] + 1) * k[:, None] / 16.0)
    d[0] *= 1.0 / np.sqrt(2.0)
    return (d * 0.5).astype(np.float32)


def _block_dct8(y: jnp.ndarray) -> jnp.ndarray:
    """(T, H, W) -> (T, H/8, W/8, 8, 8) DCT coefficients per 8x8 block."""
    t, h, w = y.shape
    h8, w8 = h // 8, w // 8
    y = y[:, : h8 * 8, : w8 * 8]
    blocks = y.reshape(t, h8, 8, w8, 8).transpose(0, 1, 3, 2, 4)
    d = jnp.asarray(_dct8_matrix())
    return jnp.einsum("ij,thwjk,lk->thwil", d, blocks, d)


def compression_score(frames: jnp.ndarray) -> jnp.ndarray:
    """Blockiness: deficit of high-frequency DCT energy in 8x8 blocks
    (reference degradation_router.py:265-288 measures high-freq energy ratio:
    heavily compressed video has quantized-away high frequencies)."""
    y = _luma(frames)
    coef = _block_dct8(y)
    ii = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
    hf_mask = ((ii + jj) >= 8).astype(jnp.float32)
    energy = coef * coef
    hf = jnp.sum(energy * hf_mask, axis=(-1, -2))
    tot = jnp.sum(energy, axis=(-1, -2)) + 1e-8
    hf_ratio = jnp.mean(hf / tot)
    # Natural sharp content has hf_ratio ~ 0.05-0.15; compressed -> ~0.
    return jnp.clip(1.0 - hf_ratio / 0.08, 0.0, 1.0)


def blur_score(frames: jnp.ndarray) -> jnp.ndarray:
    """Motion blur via Laplacian variance (reference
    degradation_router.py:229-231): low variance => blurry."""
    y = _luma(frames)[..., None]
    k = jnp.asarray(
        np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
    )[..., None, None]
    lap = jax.lax.conv_general_dilated(
        y, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    var = jnp.var(lap * 255.0, axis=(1, 2, 3))
    # cv2 heuristic: variance < 100 blurry, > 1000 sharp.
    return jnp.clip(1.0 - jnp.mean(var) / 500.0, 0.0, 1.0)


def low_light_score(frames: jnp.ndarray) -> jnp.ndarray:
    """Brightness + dark-pixel ratio (reference degradation_router.py:233-243)."""
    y = _luma(frames)
    brightness = jnp.mean(y)
    dark_ratio = jnp.mean((y < 0.2).astype(jnp.float32))
    s = 0.6 * jnp.clip(1.0 - brightness / 0.45, 0.0, 1.0) + 0.4 * dark_ratio
    return jnp.clip(s, 0.0, 1.0)


def noise_score(frames: jnp.ndarray) -> jnp.ndarray:
    """Residual vs Gaussian blur (reference degradation_router.py:246-248)."""
    y = _luma(frames)[..., None]
    g = np.outer(*(np.array([1, 4, 6, 4, 1], np.float32) / 16.0,) * 2)
    k = jnp.asarray(g)[..., None, None]
    smooth = jax.lax.conv_general_dilated(
        y, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    sigma = jnp.std((y - smooth) * 255.0)
    return jnp.clip(sigma / 12.0, 0.0, 1.0)


def temporal_score(frames: jnp.ndarray) -> jnp.ndarray:
    """Temporal inconsistency: mean abs frame diff (reference
    degradation_router.py:251-256)."""
    if frames.shape[0] < 2:
        return jnp.zeros(())
    diff = jnp.mean(jnp.abs(frames[1:] - frames[:-1]))
    return jnp.clip(diff / 0.12, 0.0, 1.0)


def _scene_change_ratio(frames: jnp.ndarray) -> jnp.ndarray:
    """Histogram-correlation scene cuts (reference
    degradation_router.py:327-334: correlation < 0.7 => cut)."""
    if frames.shape[0] < 2:
        return jnp.zeros(())
    y = _luma(frames)
    edges = jnp.linspace(0.0, 1.0, 33)
    lo, hi = edges[:-1], edges[1:]
    flat = y.reshape(y.shape[0], -1, 1)
    hist = jnp.mean((flat >= lo) & (flat < hi), axis=1)  # (T, 32)
    hist = hist - jnp.mean(hist, axis=-1, keepdims=True)
    num = jnp.sum(hist[1:] * hist[:-1], axis=-1)
    den = jnp.sqrt(
        jnp.sum(hist[1:] ** 2, axis=-1) * jnp.sum(hist[:-1] ** 2, axis=-1)
    ) + 1e-8
    corr = num / den
    return jnp.mean((corr < 0.7).astype(jnp.float32))


@jax.jit
def degradation_scores(frames: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """All degradation + content scores in one compiled graph."""
    y = _luma(frames)
    sharpness = blur_score(frames)
    return {
        "compression": compression_score(frames),
        "motion_blur": sharpness,
        "low_light": low_light_score(frames),
        "noise": noise_score(frames),
        "temporal_inconsistency": temporal_score(frames),
        "scene_change_ratio": _scene_change_ratio(frames),
        "motion_complexity": jnp.clip(temporal_score(frames) * 1.4, 0.0, 1.0),
        "brightness": jnp.mean(y),
        "contrast": jnp.std(y),
    }
