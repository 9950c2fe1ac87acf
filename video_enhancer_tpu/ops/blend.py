"""Overlap-tile blending epilogue.

The reference blends overlapping spatial tiles with per-tile linspace weight
ramps on the host (reference fast_mamba_vsr_handler.py:728-793,
vsrm_handler.py:623-664). Here blending is a device-side weighted
overlap-add: each tile is multiplied by a separable ramp and scatter-added
into the canvas along with the weight map; a final divide normalizes seams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["tile_weights", "overlap_add_blend"]


@functools.lru_cache(maxsize=64)
def _ramp_np(size: int, overlap: int) -> np.ndarray:
    w = np.ones(size, dtype=np.float32)
    if overlap > 0:
        r = np.linspace(0.0, 1.0, overlap + 2, dtype=np.float32)[1:-1]
        w[:overlap] = r
        w[-overlap:] = r[::-1]
    return w


def tile_weights(tile_hw: tuple[int, int], overlap: int) -> jnp.ndarray:
    """Separable blending weight map ``(H, W, 1)`` for a tile."""
    h, w = tile_hw
    wh = _ramp_np(h, overlap)
    ww = _ramp_np(w, overlap)
    return jnp.asarray(wh[:, None] * ww[None, :])[..., None]


def overlap_add_blend(
    tiles: jnp.ndarray,
    origins: jnp.ndarray,
    out_hw: tuple[int, int],
    overlap: int,
) -> jnp.ndarray:
    """Blend ``tiles (N, th, tw, C)`` placed at ``origins (N, 2)`` into a canvas.

    Returns ``(H, W, C)``. Weighted overlap-add with linspace ramps matching
    the reference's blending (reference fast_mamba_vsr_handler.py:774-791).
    """
    n, th, tw, c = tiles.shape
    h, w = out_hw
    wmap = tile_weights((th, tw), overlap)
    canvas = jnp.zeros((h, w, c), jnp.float32)
    weight = jnp.zeros((h, w, 1), jnp.float32)

    def body(i, carry):
        canvas, weight = carry
        y, x = origins[i, 0], origins[i, 1]
        t = tiles[i].astype(jnp.float32) * wmap
        canvas = jax.lax.dynamic_update_slice(
            canvas, jax.lax.dynamic_slice(canvas, (y, x, 0), (th, tw, c)) + t, (y, x, 0)
        )
        weight = jax.lax.dynamic_update_slice(
            weight,
            jax.lax.dynamic_slice(weight, (y, x, 0), (th, tw, 1)) + wmap,
            (y, x, 0),
        )
        return canvas, weight

    canvas, weight = jax.lax.fori_loop(0, n, body, (canvas, weight))
    return (canvas / jnp.maximum(weight, 1e-8)).astype(tiles.dtype)
