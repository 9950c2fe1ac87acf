"""RVRT-style fallback: shifted-window spatio-temporal attention VSR.

TPU-first redesign of the reference fallback network (reference
models/backbones/rvrt/rvrt_network.py:63-396: WindowAttention3D with relative
position bias, SwinTransformerBlock with cyclic shift, RVRT_BasicLayer,
RVRTNetwork; handler rvrt_handler.py mirrors VSRM's windows/tiling). Window
partitioning is pure reshape/transpose (XLA-fusable); attention over windows
is one batched call.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import nn
from ..ops import pixel_shuffle, resize
from ..ops.attention import attention_ref

__all__ = ["init", "apply", "default_config"]


def default_config():
    return {"dim": 64, "depth": 4, "heads": 4, "window": (2, 8, 8),
            "scale": 4}


def _relpos_index(window):
    """Relative position index table for a 3D window (reference
    rvrt_network.py:63-128)."""
    wt, wh, ww = window
    coords = np.stack(
        np.meshgrid(np.arange(wt), np.arange(wh), np.arange(ww),
                    indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += wt - 1
    rel[..., 1] += wh - 1
    rel[..., 2] += ww - 1
    idx = (
        rel[..., 0] * (2 * wh - 1) * (2 * ww - 1)
        + rel[..., 1] * (2 * ww - 1)
        + rel[..., 2]
    )
    return idx  # (N, N)


def _block_init(key, dim, heads, window):
    ks = jax.random.split(key, 4)
    wt, wh, ww = window
    table = (2 * wt - 1) * (2 * wh - 1) * (2 * ww - 1)
    return {
        "norm1": nn.layer_norm_init(dim),
        "qkv": nn.dense_init(ks[0], dim, 3 * dim, bias=False),
        "proj": nn.dense_init(ks[1], dim, dim),
        "bias_table": jax.random.normal(ks[2], (table, heads), jnp.float32)
        * 0.02,
        "norm2": nn.layer_norm_init(dim),
        "mlp": nn.mlp_init(ks[3], dim, 2 * dim),
    }


def init(key, dim: int = 64, depth: int = 4, heads: int = 4,
         window=(2, 8, 8), scale: int = 4):
    ks = jax.random.split(key, depth + 3)
    params = {
        "embed": nn.conv3d_init(ks[0], 1, 3, 3, 3, dim),
        "blocks": [_block_init(ks[1 + i], dim, heads, tuple(window))
                   for i in range(depth)],
        "recon": nn.conv3d_init(ks[depth + 1], 1, 3, 3, dim, dim),
        "head": nn.conv3d_init(ks[depth + 2], 1, 3, 3, dim,
                               3 * scale * scale, zero=True),
    }
    meta = {"dim": dim, "depth": depth, "heads": heads,
            "window": tuple(window), "scale": scale}
    return params, meta


def _window_partition(x, window):
    b, t, h, w, c = x.shape
    wt, wh, ww = window
    x = x.reshape(b, t // wt, wt, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wt * wh * ww, c)


def _window_reverse(wins, window, shape):
    b, t, h, w, c = shape
    wt, wh, ww = window
    x = wins.reshape(b, t // wt, h // wh, w // ww, wt, wh, ww, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, t, h, w, c)


def _swin_block(blk, x, heads, window, shift, relpos_idx):
    b, t, h, w, c = x.shape
    wt, wh, ww = window
    shortcut = x
    x = nn.layer_norm_apply(blk["norm1"], x)
    if shift:
        x = jnp.roll(x, (-wt // 2, -wh // 2, -ww // 2), axis=(1, 2, 3))
    wins = _window_partition(x, window)           # (nW, N, C)
    nW, N, _ = wins.shape
    q, k, v = jnp.split(nn.dense_apply(blk["qkv"], wins), 3, axis=-1)

    def mh(z):
        return z.reshape(nW, N, heads, c // heads).transpose(0, 2, 1, 3)

    import os

    bias = blk["bias_table"][relpos_idx]          # (N, N, heads)
    bias = bias.transpose(2, 0, 1)                # (heads, N, N)
    if (jax.default_backend() == "tpu"
            and os.environ.get("VETPU_RVRT_ATTN", "ref") == "kernel"):
        # Fused windowed-attention Pallas kernel (VETPU_RVRT_ATTN=kernel):
        # keeps each window group's scores in VMEM instead of the XLA
        # path's fp32 (nW, heads, N, N) logits round-trip through HBM.
        # MEASURED SLOWER than the XLA path on the real chip and therefore
        # NOT the default: interleaved A/B at 8x180p (scripts/
        # rvrt_kernel_ab.py, round-5 log) — ref 40.0 ms vs kernel 48.7 ms
        # median, bit-exact (max|delta| = 0). XLA already fuses the
        # softmax well enough that the kernel's per-group grid overhead
        # and unfused qkv/proj boundaries cost more than the HBM traffic
        # it saves. Kept behind the env for future shapes where the
        # logits tensor dominates (larger windows / more heads).
        from ..ops.attention import window_attention_diffable

        a = window_attention_diffable(mh(q), mh(k), mh(v), bias,
                                      1.0 / (c // heads) ** 0.5)
    else:
        a = attention_ref(mh(q), mh(k), mh(v), bias=bias[None])
    a = a.transpose(0, 2, 1, 3).reshape(nW, N, c)
    x = nn.dense_apply(blk["proj"], a)
    x = _window_reverse(x, window, (b, t, h, w, c))
    if shift:
        x = jnp.roll(x, (wt // 2, wh // 2, ww // 2), axis=(1, 2, 3))
    x = shortcut + x
    return x + nn.mlp_apply(blk["mlp"], nn.layer_norm_apply(blk["norm2"], x))


def apply(params, clip: jnp.ndarray, scale: int = 4, heads: int = 4,
          window=(2, 8, 8)) -> jnp.ndarray:
    """(B, T, H, W, 3) -> (B, T, sH, sW, 3); pads to window multiples."""
    b, t, h, w, _ = clip.shape
    wt, wh, ww = window
    pt, ph, pw = (-t) % wt, (-h) % wh, (-w) % ww
    x = jnp.pad(clip, ((0, 0), (0, pt), (0, ph), (0, pw), (0, 0)),
                mode="edge")

    feats = nn.conv3d_apply(params["embed"], x)
    relpos_idx = jnp.asarray(_relpos_index(window))
    for i, blk in enumerate(params["blocks"]):
        feats = _swin_block(blk, feats, heads, window, shift=bool(i % 2),
                            relpos_idx=relpos_idx)
    feats = jax.nn.silu(nn.conv3d_apply(params["recon"], feats))
    res = pixel_shuffle(nn.conv3d_apply(params["head"], feats), scale)
    res = res[:, :t, : h * scale, : w * scale, :]

    base = resize(clip, (h * scale, w * scale), method="cubic",
                  antialias=False)
    return jnp.clip(base + res, 0.0, 1.0)
