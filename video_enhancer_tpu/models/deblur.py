"""Deblurring experts: BSSTNet-style and VDDiff-style modules.

The reference ships only toy 3-conv stubs for these (reference
models/enhancement/deblur/bsstnet_handler.py:9-32, vddiff_handler.py:9-31)
and keeps deblur disabled in routing (reference degradation_router.py:377).
These are faithful functional equivalents: small residual conv nets with a
``deblur(frames)`` entry; zero-init heads so untrained = identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn

__all__ = ["bsstnet_init", "bsstnet_apply", "vddiff_init", "vddiff_apply"]


def bsstnet_init(key, dim: int = 32):
    ks = jax.random.split(key, 3)
    return {
        "c1": nn.conv2d_init(ks[0], 3, 3, 3, dim),
        "c2": nn.conv2d_init(ks[1], 3, 3, dim, dim),
        "c3": nn.conv2d_init(ks[2], 3, 3, dim, 3, zero=True),
    }


def bsstnet_apply(params, frames: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> deblurred."""
    h = jax.nn.relu(nn.conv2d_apply(params["c1"], frames))
    h = jax.nn.relu(nn.conv2d_apply(params["c2"], h))
    return jnp.clip(frames + nn.conv2d_apply(params["c3"], h), 0.0, 1.0)


def vddiff_init(key, dim: int = 32):
    ks = jax.random.split(key, 3)
    return {
        "c1": nn.conv2d_init(ks[0], 5, 5, 3, dim),
        "c2": nn.conv2d_init(ks[1], 3, 3, dim, dim),
        "c3": nn.conv2d_init(ks[2], 3, 3, dim, 3, zero=True),
    }


def vddiff_apply(params, frames: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.silu(nn.conv2d_apply(params["c1"], frames))
    h = jax.nn.silu(nn.conv2d_apply(params["c2"], h)) + h
    return jnp.clip(frames + nn.conv2d_apply(params["c3"], h), 0.0, 1.0)
