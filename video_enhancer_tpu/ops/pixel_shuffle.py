"""Depth<->space rearrangement for sub-pixel upsampling.

Replaces the reference's per-frame ``nn.PixelShuffle`` epilogue
(reference vsrm_handler.py:126-137, fast_mamba_vsr_handler.py:215-270).
Channels-last layout (TPU-native): ``(..., H, W, C)``. Channel ordering
matches torch's PixelShuffle (``c_out*s*s`` blocked as ``(c_out, s, s)``) so
converted torch checkpoints reproduce outputs exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pixel_shuffle", "pixel_unshuffle"]


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """``(..., H, W, C*s*s) -> (..., H*s, W*s, C)`` (depth_to_space)."""
    *lead, h, w, c = x.shape
    if c % (scale * scale):
        raise ValueError(f"channels {c} not divisible by scale^2={scale * scale}")
    c_out = c // (scale * scale)
    x = x.reshape(*lead, h, w, c_out, scale, scale)
    nd = x.ndim
    # (..., H, s_h, W, s_w, c_out)
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 2, nd - 4, nd - 1, nd - 3)
    x = x.transpose(perm)
    return x.reshape(*lead, h * scale, w * scale, c_out)


def pixel_unshuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """``(..., H*s, W*s, C) -> (..., H, W, C*s*s)`` (space_to_depth)."""
    *lead, hs, ws, c = x.shape
    if hs % scale or ws % scale:
        raise ValueError(f"spatial dims ({hs},{ws}) not divisible by {scale}")
    h, w = hs // scale, ws // scale
    x = x.reshape(*lead, h, scale, w, scale, c)
    nd = x.ndim
    # (..., h, w, c, s_h, s_w)
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 1, nd - 4, nd - 2)
    x = x.transpose(perm)
    return x.reshape(*lead, h, w, c * scale * scale)
