"""Backward warping (grid_sample) for flow-based alignment.

Replaces the reference's per-frame ``F.grid_sample`` calls in deformable
alignment (reference vsrm_handler.py:157-209), the temporal consistency module
(reference seedvr2_handler.py:133-248) and optical-flow temporal smoothing
(reference app.py:811-849). Implemented as four gathers + bilinear blend —
gathers vectorize on the VPU; shapes stay static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["flow_warp", "grid_sample"]


def grid_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample ``img`` at absolute pixel coordinates.

    img: ``(H, W, C)``; coords: ``(..., 2)`` as (y, x) in pixel units.
    Border mode: clamp (replicate), align_corners=True pixel convention.
    """
    h, w = img.shape[0], img.shape[1]
    y, x = coords[..., 0], coords[..., 1]
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (y - y0.astype(img.dtype))[..., None]
    wx = (x - x0.astype(img.dtype))[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``img`` by ``flow``.

    img: ``(..., H, W, C)``; flow: ``(..., H, W, 2)`` as (dy, dx) —
    ``out[y, x] = img[y + dy, x + dx]`` (bilinear, border clamp).
    Leading axes are mapped with vmap.
    """
    if img.ndim == 3:
        h, w = img.shape[0], img.shape[1]
        yy = jnp.arange(h, dtype=img.dtype)[:, None]
        xx = jnp.arange(w, dtype=img.dtype)[None, :]
        coords = jnp.stack(
            [yy + flow[..., 0], xx + flow[..., 1]], axis=-1
        )
        return grid_sample(img, coords)
    return jax.vmap(flow_warp)(img, flow)
