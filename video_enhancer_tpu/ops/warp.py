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

__all__ = ["flow_warp", "flow_warp_local", "grid_sample"]


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

    TPU formulation: gathers here are index-bound at small C, so the four
    bilinear corners are packed channel-wise and fetched with as few
    gathers as the row width allows:

    - ``C <= 32``: ONE gather of 4C channels per pixel — the image
      concatenated with its x-, y-, and xy-shifted copies (edge clamp), so
      the single row at (y0, x0) holds all four corners. Measured on v5e at
      8x360p: 1.5x faster than two gathers at C=3, 3.2x at C=16.
    - larger C: TWO gathers of 2C channels (x-pair packing only) — the
      4C rows get byte-bound and packing stops paying (tie at C=64).
    """
    if img.ndim == 3:
        out = flow_warp(img[None], flow[None])
        return out[0]
    if img.ndim > 4:
        lead = img.shape[:-3]
        out = flow_warp(img.reshape((-1,) + img.shape[-3:]),
                        flow.reshape((-1,) + flow.shape[-3:]))
        return out.reshape(lead + out.shape[-3:])

    B, H, W, C = img.shape
    ff = flow.astype(jnp.float32)
    y = jnp.clip(jnp.arange(H, dtype=jnp.float32)[None, :, None]
                 + ff[..., 0], 0.0, H - 1.0)
    x = jnp.clip(jnp.arange(W, dtype=jnp.float32)[None, None, :]
                 + ff[..., 1], 0.0, W - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    wy = (y - y0)[..., None].astype(img.dtype)
    wx = (x - x0)[..., None].astype(img.dtype)

    # img with its x-shifted copy: row (y, x0) holds v.0 = img[y, x0] and
    # v.1 = img[y, x0+1|clamp].
    xs = jnp.pad(img[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)),
                 mode="edge")

    if C <= 32:
        ys = jnp.pad(img[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)),
                     mode="edge")
        xys = jnp.pad(xs[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)),
                      mode="edge")
        flat = jnp.concatenate([img, xs, ys, xys],
                               axis=-1).reshape(B, H * W, 4 * C)
        idx = (y0 * W + x0).reshape(B, H * W)
        r = jnp.take_along_axis(flat, idx[..., None],
                                axis=1).reshape(B, H, W, 4 * C)
        top = r[..., :C] * (1 - wx) + r[..., C:2 * C] * wx
        bot = r[..., 2 * C:3 * C] * (1 - wx) + r[..., 3 * C:] * wx
        return top * (1 - wy) + bot * wy

    flat = jnp.concatenate([img, xs], axis=-1).reshape(B, H * W, 2 * C)

    def take(yi):
        idx = (yi * W + x0).reshape(B, H * W)
        return jnp.take_along_axis(flat, idx[..., None],
                                   axis=1).reshape(B, H, W, 2 * C)

    r0 = take(y0)
    r1 = take(jnp.minimum(y0 + 1, H - 1))
    top = r0[..., :C] * (1 - wx) + r0[..., C:] * wx
    bot = r1[..., :C] * (1 - wx) + r1[..., C:] * wx
    return top * (1 - wy) + bot * wy


def flow_warp_local(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp by a SUB-PIXEL flow (|flow| < 1) without gathers.

    For |d| < 1 the bilinear corners lie in the 3x3 neighborhood, so the
    warp is exactly a shift-and-blend: out = sum_{s in {-1,0,1}^2}
    hat(dy - sy) * hat(dx - sx) * shift(img, sy, sx) with hat(u) =
    max(0, 1 - |u|). Nine shifted elementwise multiply-adds — all XLA-
    fusable VPU work — instead of the per-index gather cost that made
    VSRM's deformable alignment 12 ms of its 133 ms clip (the trained
    aligner's offsets measure p99 = 0.89 px, so the sub-pixel contract
    matches what the model actually learned; the model clamps with tanh).

    img: ``(..., H, W, C)``; flow: ``(..., H, W, 2)`` as (dy, dx).
    Identical to ``flow_warp`` for |flow| < 1 (border clamp included).
    """
    ff = flow.astype(img.dtype)
    dy = ff[..., 0:1]
    dx = ff[..., 1:2]
    out = jnp.zeros_like(img)
    h_ax, w_ax = img.ndim - 3, img.ndim - 2

    def shift(a, s, axis):
        if s == 0:
            return a
        pad = [(0, 0)] * a.ndim
        # out[i] = a[i + s] with edge clamp.
        if s > 0:
            pad[axis] = (0, s)
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(s, None)
            return jnp.pad(a[tuple(sl)], pad, mode="edge")
        pad[axis] = (-s, 0)
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(None, s)
        return jnp.pad(a[tuple(sl)], pad, mode="edge")

    for sy in (-1, 0, 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - sy))
        row = shift(img, sy, h_ax)
        for sx in (-1, 0, 1):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - sx))
            out = out + wy * wx * shift(row, sx, w_ax)
    return out
