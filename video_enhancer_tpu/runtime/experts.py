"""Pre/post processing experts, as jitted device ops.

Reference equivalents: ``_preprocess_video`` (reference app.py:786-808 —
cv2 denoise / CLAHE low-light / compression cleanup before the SOTA model)
and ``_temporal_smooth`` (reference app.py:811-849 — optical-flow warp +
0.7/0.3 blend). Here each expert is a pure function over a clip
``(T, H, W, 3)`` float32 [0,1]; the preprocess graph compiles once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["preprocess_clip", "temporal_smooth", "estimate_flow_farneback"]


def _gauss3(clip):
    g = np.outer(*(np.array([1, 2, 1], np.float32) / 4.0,) * 2)
    k = jnp.asarray(g)[..., None, None]
    t, h, w, c = clip.shape
    x = clip.reshape(t, h, w, c)
    out = jax.lax.conv_general_dilated(
        x, jnp.tile(k, (1, 1, 1, c)), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def denoise(clip: jnp.ndarray, strength: float = 0.5) -> jnp.ndarray:
    """Edge-preserving smooth: blend gaussian blur where gradients are low."""
    smooth = _gauss3(clip)
    grad = jnp.abs(clip - smooth)
    edge = jnp.clip(grad * 8.0, 0.0, 1.0)
    alpha = strength * (1.0 - edge)
    return clip * (1 - alpha) + smooth * alpha


def low_light_boost(clip: jnp.ndarray, gamma: float = 0.6) -> jnp.ndarray:
    """Gamma lift + mild contrast stretch (reference uses CLAHE)."""
    lifted = jnp.power(jnp.clip(clip, 1e-6, 1.0), gamma)
    mean = jnp.mean(lifted, axis=(1, 2, 3), keepdims=True)
    return jnp.clip(mean + (lifted - mean) * 1.05, 0.0, 1.0)


def compression_cleanup(clip: jnp.ndarray) -> jnp.ndarray:
    """Deblock: light blur then unsharp to recover edges."""
    smooth = _gauss3(clip)
    deblocked = 0.6 * clip + 0.4 * smooth
    sharp = deblocked + 0.3 * (deblocked - _gauss3(deblocked))
    return jnp.clip(sharp, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("do_denoise", "do_lowlight",
                                             "do_compression"))
def preprocess_clip(clip: jnp.ndarray, do_denoise: bool = False,
                    do_lowlight: bool = False,
                    do_compression: bool = False) -> jnp.ndarray:
    if do_compression:
        clip = compression_cleanup(clip)
    if do_denoise:
        clip = denoise(clip)
    if do_lowlight:
        clip = low_light_boost(clip)
    return clip


def estimate_flow_farneback(prev: np.ndarray, cur: np.ndarray) -> np.ndarray:
    """Host-side Farneback optical flow (reference app.py:811-849 uses
    DIS/Farneback). Returns (H, W, 2) as (dy, dx)."""
    import cv2

    pg = cv2.cvtColor((prev * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    cg = cv2.cvtColor((cur * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    flow = cv2.calcOpticalFlowFarneback(
        cg, pg, None, 0.5, 3, 15, 3, 5, 1.2, 0
    )  # cur -> prev
    return np.stack([flow[..., 1], flow[..., 0]], axis=-1)


def temporal_smooth(clip: np.ndarray, blend: float = 0.3) -> np.ndarray:
    """Optical-flow-compensated temporal blend, 0.7 current / 0.3 warped
    previous (reference app.py:811-849)."""
    from ..ops.warp import flow_warp

    out = [clip[0]]
    for i in range(1, clip.shape[0]):
        flow = jnp.asarray(estimate_flow_farneback(out[-1], clip[i]))
        warped = flow_warp(jnp.asarray(np.asarray(out[-1])), flow)
        frame = (1 - blend) * clip[i] + blend * np.asarray(warped)
        out.append(frame.astype(np.float32))
    return np.stack(out)
