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
    feats = [x]
    for i, conv in enumerate(convs[:-1]):
        h = jax.nn.leaky_relu(
            nn.conv2d_apply(conv, jnp.concatenate(feats, axis=-1)), 0.2
        )
        feats.append(h)
    out = nn.conv2d_apply(convs[-1], jnp.concatenate(feats, axis=-1))
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
