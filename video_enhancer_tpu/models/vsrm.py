"""VSRM: Mamba-based video super-resolution with deformable alignment.

TPU-first redesign of the reference network (reference
models/enhancement/vsr/vsrm_handler.py:52-137: Conv3d embed -> 6x
EAMambaVideoBlock -> DeformableCrossMamba alignment -> Conv3d recon ->
per-frame PixelShuffle x4) and its EAMamba blocks (reference
models/backbones/mamba/ea_mamba_blocks.py). The two pathologies called out in
SURVEY.md §7 are re-expressed natively:

- the sequential Python-loop selective scan (ea_mamba_blocks.py:120-147)
  becomes the SSD chunked-matmul scan (ops/ssd.py) over the flattened
  spatial raster (L = H*W) — scalar-per-head decays so the MXU does the
  work instead of a VPU elementwise scan;
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
from ..nn.ssm import (attentive_ssm_apply, attentive_ssm_init, bissd_apply,
                      bissd_init, bissm_apply, bissm_apply_sharded,
                      bissm_init)
from ..ops import pixel_shuffle, resize
from ..ops.attention import site_attention
from ..ops.warp import flow_warp_local

__all__ = ["init", "apply", "default_config"]


def default_config():
    return {"dim": 64, "num_blocks": 6, "scale": 4, "state_dim": 16,
            "heads": 4, "mixer": "ssd"}


def _block_init(key, dim, state_dim, heads, mixer="ssd"):
    ks = jax.random.split(key, 8)
    if mixer == "attentive":
        # MambaIRv2-style backbone (reference mambairv2_blocks.py:35-139,
        # selected by PREFERRED_BACKBONE env at model_config.py:108 but
        # never wired into a handler there — here it is routable).
        spatial = attentive_ssm_init(ks[0], dim)
    else:
        # Long-L raster scan -> bidirectional Mamba-2/SSD (matmul form,
        # MXU-bound; shared projections, direction-specific decays).
        spatial = bissd_init(ks[0], dim, state_dim=2 * state_dim,
                             head_dim=64)
    return {
        "spatial_norm": nn.layer_norm_init(dim),
        "spatial_ssm": spatial,
        "temporal_norm": nn.layer_norm_init(dim),
        "qkv": nn.dense_init(ks[1], dim, 3 * dim, bias=False),
        "attn_out": nn.dense_init(ks[2], dim, dim),
        # Temporal scans run at per-pixel batch; shared streams + N=4 keep
        # the exp-heavy per-step state update cheap (the fused short kernel
        # is transcendental-bound at this batch).
        "temporal_ssm": bissm_init(ks[3], dim, state_dim=min(state_dim, 4)),
        "mlp_norm": nn.layer_norm_init(dim),
        "mlp": nn.mlp_init(ks[4], dim, dim * 2),
    }


def init(key, dim: int = 64, num_blocks: int = 6, scale: int = 4,
         state_dim: int = 8, heads: int = 4, mixer: str = "ssd"):
    ks = jax.random.split(key, num_blocks + 5)
    params = {
        "embed": nn.conv3d_init(ks[0], 1, 3, 3, 3, dim),
        "blocks": [
            _block_init(ks[1 + i], dim, state_dim, heads, mixer=mixer)
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
            "heads": heads, "mixer": mixer}
    return params, meta


def _spatial_ssm(p, x, impl, mixer: str = "ssd"):
    """Bidirectional spatial scan of each frame: one flattened H*W raster
    sequence (the reference's order, ea_mamba_blocks.py:120-147) through
    the SSD chunked-matmul scan. An axial (rows + columns) Mamba-1 variant
    was measured SLOWER on v5e (715 vs 452 ms at 180p — doubled projections
    dominate) and was dropped when the mixer moved to SSD.

    ``mixer="attentive"`` swaps in the MambaIRv2-style conv+attention
    mixer (nn/ssm.py attentive_ssm_*) per frame instead.
    """
    b, t, h, w, c = x.shape
    if mixer == "attentive":
        y = attentive_ssm_apply(p, x.reshape(b * t, h, w, c))
        return y.reshape(b, t, h, w, c)
    seq = x.reshape(b * t, h * w, c)
    y = bissd_apply(p, seq)
    return y.reshape(b, t, h, w, c)


def _temporal_mix(blk, x, heads, time_axis=None):
    """Batched temporal attention + temporal SSM over every spatial site.

    T is tiny (a chunk of frames), so the attention runs in the shared
    broadcast form (ops/attention.py:site_attention) that keeps C as the
    lane (minor) dimension: per-head matmul layouts put (T, dh) = (7, 16)
    in the native 8x128 tile, measured ~10x slower on v5e.

    With ``time_axis`` (inside shard_map over a T-sharded clip) the
    attention stays EXACT: queries are local, keys/values are all-gathered
    over the mesh axis (T is short — gather beats a ring here), and the
    temporal SSM runs the distributed prefix-combine scans.
    """
    b, t, h, w, c = x.shape
    seq = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)

    qkv = nn.dense_apply(blk["qkv"], seq)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if time_axis is not None:
        k = jax.lax.all_gather(k, time_axis, axis=1, tiled=True)
        v = jax.lax.all_gather(v, time_axis, axis=1, tiled=True)
    attn = site_attention(q, k, v, heads)
    seq = seq + nn.dense_apply(blk["attn_out"], attn)
    # shared-stream fused bidir short-scan kernel (B = B*H*W is huge here).
    if time_axis is not None:
        seq = seq + bissm_apply_sharded(blk["temporal_ssm"], seq,
                                        axis_name=time_axis)
    else:
        seq = seq + bissm_apply(blk["temporal_ssm"], seq)
    return seq.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)


def _deformable_align(params, feats):
    """Flow-based alignment toward the clip's motion (reference
    DeformableCrossMamba, vsrm_handler.py:157-209: offsets -> per-frame
    grid_sample -> fuse). Offsets are zero-init so alignment starts as
    identity.

    Round 3: offsets are tanh-clamped to (-1, 1) px and the warp runs as
    the gather-free 3x3 shift-and-blend (ops/warp.py:flow_warp_local).
    The round-2 trained aligner's offsets measured p99 = 0.89 px — the
    learned alignment is sub-pixel, and the arbitrary-range gather warp
    was 12 ms of the 133 ms clip (fine-tuned after the change)."""
    offsets = jnp.tanh(nn.conv3d_apply(params["offset"], feats))
    b, t, h, w, c = feats.shape
    flat_feats = feats.reshape(b * t, h, w, c)
    flat_flow = offsets.astype(flat_feats.dtype).reshape(b * t, h, w, 2)
    warped = flow_warp_local(flat_feats, flat_flow).reshape(b, t, h, w, c)
    fused = nn.conv3d_apply(
        params["align_fuse"], jnp.concatenate([feats, warped], axis=-1)
    )
    return feats + fused


def apply(params, clip: jnp.ndarray, scale: int = 4, heads: int = 4,
          scan_impl: str | None = None, mixer: str = "ssd",
          time_axis: str | None = None) -> jnp.ndarray:
    """(B, T, H, W, 3) in [0,1] -> (B, T, scale*H, scale*W, 3).

    ``time_axis``: run EXACTLY over a T-sharded clip inside shard_map —
    gathered-K/V temporal attention + distributed temporal scans (every
    conv has a T-kernel of 1, so no other coupling exists)."""
    x = clip
    feats = nn.conv3d_apply(params["embed"], x)

    for blk in params["blocks"]:
        h = nn.layer_norm_apply(blk["spatial_norm"], feats)
        feats = feats + _spatial_ssm(blk["spatial_ssm"], h, scan_impl,
                                     mixer=mixer)
        h = nn.layer_norm_apply(blk["temporal_norm"], feats)
        feats = feats + _temporal_mix(blk, h, heads, time_axis=time_axis)
        h = nn.layer_norm_apply(blk["mlp_norm"], feats)
        feats = feats + nn.mlp_apply(blk["mlp"], h)

    feats = _deformable_align(params, feats)
    feats = jax.nn.silu(nn.conv3d_apply(params["recon"], feats))
    res = pixel_shuffle(nn.conv3d_apply(params["head"], feats), scale)

    base = resize(x, (x.shape[2] * scale, x.shape[3] * scale),
                  method="cubic", antialias=False)
    return jnp.clip(base + res, 0.0, 1.0)
