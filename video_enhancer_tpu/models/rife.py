"""RIFE-style frame interpolation: coarse-to-fine IFNet + refinement UNet.

TPU-first re-implementation of the reference's from-scratch RIFE (reference
models/interpolation/rife_handler.py:63-227: three coarse-to-fine IFBlocks
estimating bidirectional flow + fusion mask, Contextnet/Unet refinement,
midpoint interpolation). Multi-scale flow runs at 1/4, 1/2, 1/1 resolution
with flow upsampling between levels; warping uses the shared grid-sample op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn
from ..ops import resize
from ..ops.warp import flow_warp

__all__ = ["init", "apply", "interpolate_pair", "default_config"]


def default_config():
    return {"dim": 32, "levels": 3}


def _ifblock_init(key, cin, dim):
    ks = jax.random.split(key, 4)
    return {
        "c1": nn.conv2d_init(ks[0], 3, 3, cin, dim),
        "c2": nn.conv2d_init(ks[1], 3, 3, dim, dim),
        "c3": nn.conv2d_init(ks[2], 3, 3, dim, dim),
        # 4 flow channels (two bidirectional flows) + 1 fusion mask logit.
        "head": nn.conv2d_init(ks[3], 3, 3, dim, 5, zero=True),
    }


def _ifblock_apply(p, x):
    h = jax.nn.leaky_relu(nn.conv2d_apply(p["c1"], x), 0.2)
    h = jax.nn.leaky_relu(nn.conv2d_apply(p["c2"], h), 0.2)
    h = jax.nn.leaky_relu(nn.conv2d_apply(p["c3"], h), 0.2)
    out = nn.conv2d_apply(p["head"], h)
    return out[..., :4], out[..., 4:5]


def init(key, dim: int = 32, levels: int = 3):
    ks = jax.random.split(key, levels + 2)
    params = {
        # Level inputs: frames(6) + upsampled flow(4) + mask(1) except level 0.
        "blocks": [
            _ifblock_init(ks[i], 6 if i == 0 else 11, dim * (2 ** (levels - 1 - i)))
            for i in range(levels)
        ],
        "refine1": nn.conv2d_init(ks[levels], 3, 3, 13, dim),
        "refine2": nn.conv2d_init(ks[levels + 1], 3, 3, dim, 3, zero=True),
    }
    meta = {"dim": dim, "levels": levels}
    return params, meta


def interpolate_pair(params, f0: jnp.ndarray, f1: jnp.ndarray) -> jnp.ndarray:
    """Midpoint frame between two (B, H, W, 3) frames in [0, 1]."""
    b, h, w, _ = f0.shape
    levels = len(params["blocks"])
    flow = None
    mask = None
    for lvl, blk in enumerate(params["blocks"]):
        s = 2 ** (levels - 1 - lvl)
        hw = (h // s, w // s)
        a = resize(f0, hw, method="linear") if s > 1 else f0
        c = resize(f1, hw, method="linear") if s > 1 else f1
        if flow is None:
            inp = jnp.concatenate([a, c], axis=-1)
        else:
            if s == 1:
                # Finest level: warp the IFBlock's guidance inputs at HALF
                # resolution and upsample. Full-res warp gathers dominate
                # RIFE's runtime on TPU (24.6 of 147 ms each, measured
                # v5e 8x360p); the warped frames here only guide the flow
                # correction — the final output warps stay full-res.
                # The incoming flow/mask are already at half resolution in
                # half-res pixel units — warp there, then upsample.
                hw2 = (h // 2, w // 2)
                wa = resize(flow_warp(resize(a, hw2, method="linear"),
                                      flow[..., 0:2]),
                            hw, method="linear")
                wc = resize(flow_warp(resize(c, hw2, method="linear"),
                                      flow[..., 2:4]),
                            hw, method="linear")
                flow = resize(flow, hw, method="linear") * 2.0
                mask = resize(mask, hw, method="linear")
            else:
                flow = resize(flow, hw, method="linear") * 2.0
                mask = resize(mask, hw, method="linear")
                wa = flow_warp(a, flow[..., 0:2])
                wc = flow_warp(c, flow[..., 2:4])
            inp = jnp.concatenate([wa, wc, flow, mask], axis=-1)  # 11 ch
        d_flow, d_mask = _ifblock_apply(blk, inp)
        flow = d_flow if flow is None else flow + d_flow
        mask = d_mask if mask is None else mask + d_mask

    w0 = flow_warp(f0, flow[..., 0:2])
    w1 = flow_warp(f1, flow[..., 2:4])
    m = jax.nn.sigmoid(mask)
    mid = m * w0 + (1 - m) * w1

    ref_in = jnp.concatenate([mid, w0, w1, flow], axis=-1)  # 3+3+3+4 = 13
    r = jax.nn.leaky_relu(nn.conv2d_apply(params["refine1"], ref_in), 0.2)
    mid = mid + nn.conv2d_apply(params["refine2"], r)
    return jnp.clip(mid, 0.0, 1.0)


def apply(params, clip: jnp.ndarray) -> jnp.ndarray:
    """2x temporal upsampling of (B, T, H, W, 3): T -> 2T-1."""
    b, t, h, w, c = clip.shape
    if t < 2:
        return clip
    f0 = clip[:, :-1].reshape(b * (t - 1), h, w, c)
    f1 = clip[:, 1:].reshape(b * (t - 1), h, w, c)
    mids = interpolate_pair(params, f0, f1).reshape(b, t - 1, h, w, c)
    out = jnp.zeros((b, 2 * t - 1, h, w, c), clip.dtype)
    out = out.at[:, 0::2].set(clip)
    out = out.at[:, 1::2].set(mids)
    return out
