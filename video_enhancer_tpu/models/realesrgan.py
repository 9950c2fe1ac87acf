"""Real-ESRGAN-style RRDB single-frame super-resolution.

TPU-first re-implementation of the reference's internal Real-ESRGAN
(reference models/enhancement/vsr/realesrgan_handler.py:23-100:
ResidualDenseBlock / RRDB trunk + nearest-upsample conv head). Kept per-frame
(the agent's default model, reference video_enhancer_sota.py:313-314);
the registry wraps it into clip form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn
from ..ops import resize

__all__ = ["init", "apply", "default_config"]


def default_config():
    return {"features": 64, "num_blocks": 6, "growth": 32, "scale": 4}


def _rdb_init(key, feat, growth):
    ks = jax.random.split(key, 5)
    return [
        nn.conv2d_init(ks[i], 3, 3, feat + i * growth,
                       growth if i < 4 else feat)
        for i in range(5)
    ]


def _rdb_apply(convs, x):
    """Residual dense block in scatter (source-fused) form.

    The textbook form runs five convs whose outputs are growth=32 channels
    wide — a quarter of the MXU's 128 output lanes — and concatenates
    activations before each. This computes the SAME function (exact
    reassociation, no retrain: conv_i(concat(srcs)) = sum_s conv(src_s,
    W_i[slice_s])) but fuses, per source, all of its outgoing weight
    slices into ONE wide conv (cout 192/160/128/96/64 for x/y1..y4), then
    scatters slices of that output into each destination's pre-activation
    accumulator. Full-lane MXU convs, no activation concats, identical
    FLOPs. The weight concats are constant-folded by XLA (params are
    trace constants)."""
    n = len(convs)
    feat = convs[0]["w"].shape[2]
    growth = convs[0]["w"].shape[3]
    acc = [None] * n

    def add(i, v):
        acc[i] = v if acc[i] is None else acc[i] + v

    src = x
    for s in range(n):
        # Source s (0 = x, s>=1 = y_s) feeds convs s..n-1; its channel
        # slice inside conv_i's cin starts at 0 (x) or feat+(s-1)*growth.
        off = 0 if s == 0 else feat + (s - 1) * growth
        width = feat if s == 0 else growth
        dests = range(s, n)
        wcat = jnp.concatenate(
            [convs[i]["w"][:, :, off:off + width, :] for i in dests],
            axis=-1)
        o = nn.conv2d_apply({"w": wcat}, src)
        pos = 0
        for i in dests:
            cout = convs[i]["w"].shape[-1]
            add(i, o[..., pos:pos + cout])
            pos += cout
        if s < n - 1:
            src = jax.nn.leaky_relu(
                acc[s] + convs[s]["b"].astype(x.dtype), 0.2)
    out = acc[n - 1] + convs[n - 1]["b"].astype(x.dtype)
    return x + 0.2 * out


def init(key, features: int = 64, num_blocks: int = 6, growth: int = 32,
         scale: int = 4):
    ks = jax.random.split(key, 3 * num_blocks + 4)
    params = {
        "stem": nn.conv2d_init(ks[0], 3, 3, 3, features),
        "rrdb": [
            [_rdb_init(ks[1 + 3 * i + j], features, growth) for j in range(3)]
            for i in range(num_blocks)
        ],
        "trunk": nn.conv2d_init(ks[3 * num_blocks + 1], 3, 3, features,
                                features),
        "up": nn.conv2d_init(ks[3 * num_blocks + 2], 3, 3, features,
                             features),
        "head": nn.conv2d_init(ks[3 * num_blocks + 3], 3, 3, features, 3,
                               zero=True),
    }
    meta = {"features": features, "num_blocks": num_blocks, "scale": scale}
    return params, meta


def apply(params, frames: jnp.ndarray, scale: int = 4) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, sH, sW, 3)."""
    h0 = nn.conv2d_apply(params["stem"], frames)
    h = h0
    for rrdb in params["rrdb"]:
        inner = h
        for rdb in rrdb:
            inner = _rdb_apply(rdb, inner)
        h = h + 0.2 * inner
    h = h0 + nn.conv2d_apply(params["trunk"], h)

    out_hw = (frames.shape[-3] * scale, frames.shape[-2] * scale)
    h = resize(h, out_hw, method="nearest")
    h = jax.nn.leaky_relu(nn.conv2d_apply(params["up"], h), 0.2)
    res = nn.conv2d_apply(params["head"], h)

    base = resize(frames, out_hw, method="cubic", antialias=False)
    return jnp.clip(base + res, 0.0, 1.0)
