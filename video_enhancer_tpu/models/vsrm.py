"""VSRM: Mamba-based video super-resolution with deformable alignment.

TPU-first redesign of the reference network (reference
models/enhancement/vsr/vsrm_handler.py:52-137: Conv3d embed -> 6x
EAMambaVideoBlock -> DeformableCrossMamba alignment -> Conv3d recon ->
per-frame PixelShuffle x4) and its EAMamba blocks (reference
models/backbones/mamba/ea_mamba_blocks.py). The two pathologies called out in
SURVEY.md §7 are re-expressed natively:

- the sequential Python-loop selective scan (ea_mamba_blocks.py:120-147)
  becomes the Pallas scan over the flattened spatial raster (L = H*W);
- the per-pixel (H x W Python loop) temporal module
  (ea_mamba_blocks.py:260-276) becomes ONE batched temporal attention with
  batch = B*H*W and sequence = T, plus a bidirectional temporal SSM.

Layout ``(B, T, H, W, C)``; untrained output degrades to exact bicubic
(zero-init head), mirroring the reference's return-original-frames fallback
(vsrm_handler.py:618-621).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn
from ..nn.ssm import bimamba_apply, bimamba_init
from ..ops import pixel_shuffle, resize
from ..ops.attention import attention_ref
from ..ops.warp import flow_warp

__all__ = ["init", "apply", "default_config"]


def default_config():
    return {"dim": 64, "num_blocks": 6, "scale": 4, "state_dim": 16,
            "heads": 4}


def _block_init(key, dim, state_dim, heads):
    ks = jax.random.split(key, 8)
    return {
        "spatial_norm": nn.layer_norm_init(dim),
        "spatial_ssm": bimamba_init(ks[0], dim, state_dim=state_dim),
        "temporal_norm": nn.layer_norm_init(dim),
        "qkv": nn.dense_init(ks[1], dim, 3 * dim, bias=False),
        "attn_out": nn.dense_init(ks[2], dim, dim),
        # Temporal scans run at per-pixel batch; N=8 keeps state HBM traffic
        # half of the spatial scan's (which keeps the full state_dim).
        "temporal_ssm": bimamba_init(ks[3], dim, state_dim=min(state_dim, 8)),
        "mlp_norm": nn.layer_norm_init(dim),
        "mlp": nn.mlp_init(ks[4], dim, dim * 2),
    }


def init(key, dim: int = 64, num_blocks: int = 6, scale: int = 4,
         state_dim: int = 8, heads: int = 4):
    ks = jax.random.split(key, num_blocks + 5)
    params = {
        "embed": nn.conv3d_init(ks[0], 1, 3, 3, 3, dim),
        "blocks": [
            _block_init(ks[1 + i], dim, state_dim, heads)
            for i in range(num_blocks)
        ],
        "offset": nn.conv3d_init(ks[num_blocks + 1], 1, 3, 3, dim, 2,
                                 zero=True),
        "align_fuse": nn.conv3d_init(ks[num_blocks + 2], 1, 1, 1, 2 * dim,
                                     dim),
        "recon": nn.conv3d_init(ks[num_blocks + 3], 1, 3, 3, dim, dim),
        "head": nn.conv3d_init(ks[num_blocks + 4], 1, 3, 3, dim,
                               3 * scale * scale, zero=True),
    }
    meta = {"dim": dim, "num_blocks": num_blocks, "scale": scale,
            "heads": heads}
    return params, meta


def _spatial_ssm(p, x, impl, mode: str = "raster"):
    """Bidirectional spatial scan of each frame.

    ``raster`` (default): one flattened H*W scan through the L-streamed
    Pallas kernel (the reference's sequence order,
    ea_mamba_blocks.py:120-147). ``axial``: rows then columns — measured
    SLOWER on v5e (715 vs 452 ms for the 6-block model at 180p: the doubled
    in/out projections outweigh the better scan shapes), kept as an option
    for experimentation.
    """
    b, t, h, w, c = x.shape
    if mode == "raster":
        seq = x.reshape(b * t, h * w, c)
        y = bimamba_apply(p, seq, impl=impl)
        return y.reshape(b, t, h, w, c)
    # rows: (B*T*H, W, C)
    rows = x.reshape(b * t * h, w, c)
    y = bimamba_apply(p, rows, impl=impl).reshape(b, t, h, w, c)
    # columns: (B*T*W, H, C)
    cols = y.transpose(0, 1, 3, 2, 4).reshape(b * t * w, h, c)
    y = bimamba_apply(p, cols, impl=impl)
    return y.reshape(b, t, w, h, c).transpose(0, 1, 3, 2, 4)


def _temporal_mix(blk, x, heads):
    """Batched temporal attention + temporal SSM over every spatial site."""
    b, t, h, w, c = x.shape
    seq = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)

    qkv = nn.dense_apply(blk["qkv"], seq)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def mh(z):  # (BHW, T, C) -> (BHW, heads, T, C//heads)
        return z.reshape(z.shape[0], t, heads, c // heads).transpose(0, 2, 1, 3)

    attn = attention_ref(mh(q), mh(k), mh(v))
    attn = attn.transpose(0, 2, 1, 3).reshape(seq.shape[0], t, c)
    seq = seq + nn.dense_apply(blk["attn_out"], attn)
    # auto impl: fused short-scan kernel on TPU (B = B*H*W is huge here).
    seq = seq + bimamba_apply(blk["temporal_ssm"], seq)
    return seq.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)


def _deformable_align(params, feats):
    """Flow-based alignment toward the clip's motion (reference
    DeformableCrossMamba, vsrm_handler.py:157-209: offsets -> per-frame
    grid_sample -> fuse). Offsets are zero-init so alignment starts as
    identity."""
    offsets = nn.conv3d_apply(params["offset"], feats)  # (B,T,H,W,2)
    b, t, h, w, c = feats.shape
    flat_feats = feats.reshape(b * t, h, w, c)
    flat_flow = offsets.astype(flat_feats.dtype).reshape(b * t, h, w, 2)
    warped = flow_warp(flat_feats, flat_flow).reshape(b, t, h, w, c)
    fused = nn.conv3d_apply(
        params["align_fuse"], jnp.concatenate([feats, warped], axis=-1)
    )
    return feats + fused


def apply(params, clip: jnp.ndarray, scale: int = 4, heads: int = 4,
          scan_impl: str | None = None) -> jnp.ndarray:
    """(B, T, H, W, 3) in [0,1] -> (B, T, scale*H, scale*W, 3)."""
    x = clip
    feats = nn.conv3d_apply(params["embed"], x)

    for blk in params["blocks"]:
        h = nn.layer_norm_apply(blk["spatial_norm"], feats)
        feats = feats + _spatial_ssm(blk["spatial_ssm"], h, scan_impl)
        h = nn.layer_norm_apply(blk["temporal_norm"], feats)
        feats = feats + _temporal_mix(blk, h, heads)
        h = nn.layer_norm_apply(blk["mlp_norm"], feats)
        feats = feats + nn.mlp_apply(blk["mlp"], h)

    feats = _deformable_align(params, feats)
    feats = jax.nn.silu(nn.conv3d_apply(params["recon"], feats))
    res = pixel_shuffle(nn.conv3d_apply(params["head"], feats), scale)

    base = resize(x, (x.shape[2] * scale, x.shape[3] * scale),
                  method="cubic", antialias=False)
    return jnp.clip(base + res, 0.0, 1.0)
