"""FastMambaVSR: efficient selective-scan video super-resolution.

TPU-first redesign of the reference network (reference
models/enhancement/vsr/fast_mamba_vsr_handler.py:110-270: separable-conv3d
embed, multi-scale cross-fusion, 8 BiMamba layers with every-2nd 0.1-scaled
skips, sub-pixel upsampler with 0.1-scaled temporal residual). Differences:

- channels-last ``(B, T, H, W, C)``; all convs NDHWC on the MXU;
- the SSM propagates along the *temporal* axis per spatial site (the natural
  video recurrence), bidirectionally, with a depthwise spatial conv mixing
  each frame — replacing the reference's ambiguous flattened-sequence scan;
- GroupNorm instead of BatchNorm (no running stats; batch-size invariant);
- bicubic base + zero-init residual head: the untrained network is exactly
  bicubic x4 (graceful degradation, reference vsrm_handler.py:618-621 returns
  original frames on failure).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn
from ..nn.ssm import bissd_init, bissm_apply, bissm_init
from ..ops import pixel_shuffle, resize
from ..ops.conv import conv3d

__all__ = ["init", "apply", "default_config"]


def default_config():
    # state_dim 8 (not the Mamba-default 16): the scan batch is per-pixel
    # (B*H*W), so SSM state HBM traffic scales as N -- and temporal windows
    # are short (8-16 frames), where N=8 loses nothing measurable.
    return {"dim": 48, "num_layers": 8, "scale": 4, "state_dim": 8,
            "expand": 2, "groups": 8}


def _sepconv3d_init(key, cin, cout, k=(1, 3, 3)):
    """Depthwise + pointwise conv3d (reference SeparableConv3d,
    fast_mamba_vsr_handler.py:136-165)."""
    k1, k2 = jax.random.split(key)
    return {
        "dw": nn.conv3d_init(k1, *k, cin, cin, groups=cin),
        "pw": nn.conv3d_init(k2, 1, 1, 1, cin, cout),
    }


def _sepconv3d_apply(p, x):
    cin = x.shape[-1]
    h = nn.conv3d_apply(p["dw"], x, groups=cin)
    return nn.conv3d_apply(p["pw"], h)


def init(key, dim: int = 48, num_layers: int = 8, scale: int = 4,
         state_dim: int = 8, expand: int = 2, groups: int = 8,
         temporal_mixer: str = "ssm"):
    ks = jax.random.split(key, num_layers + 8)
    params = {
        "embed1": _sepconv3d_init(ks[0], 3, dim),
        "embed2": _sepconv3d_init(ks[1], dim, dim),
        "ms_down2": _sepconv3d_init(ks[2], dim, dim),
        "ms_down4": _sepconv3d_init(ks[3], dim, dim),
        "ms_fuse": nn.conv3d_init(ks[4], 1, 1, 1, 3 * dim, dim),
        "layers": [],
        "refine": _sepconv3d_init(ks[5], dim, dim),
        "head": nn.conv3d_init(ks[6], 1, 3, 3, dim, 3 * scale * scale,
                               zero=True),
        "temporal": nn.conv3d_init(ks[7], 3, 1, 1, 3, 3, zero=True),
    }
    for i in range(num_layers):
        kl = jax.random.split(ks[8 + i], 3)
        params["layers"].append({
            "norm": nn.layer_norm_init(dim),
            # Shared-stream bidirectional SSM (round 2: one projection/
            # conv/x_proj feeds both directions — the separate-stream form
            # was 88 of the model's 134 ms).
            # temporal_mixer="ssd": scalar-per-head decays (Mamba-2
            # parameterization, nn.ssm.bissd_*) turn the per-frame
            # recurrence into dense masked-decay mixing — the Mamba-1
            # (D,N)-state scan is VPU-bound at its 8-sublane tile floor
            # (see BENCH_RESULTS.md round-3 log).
            "bimamba": (bissd_init(kl[0], dim, state_dim=state_dim,
                                   expand=expand, head_dim=dim)
                        if temporal_mixer == "ssd" else
                        bissm_init(kl[0], dim, state_dim=state_dim,
                                   expand=expand)),
            "spatial_dw": nn.conv3d_init(kl[1], 1, 3, 3, dim, dim, groups=dim),
            "spatial_pw": nn.conv3d_init(kl[2], 1, 1, 1, dim, dim),
        })
    meta = {"dim": dim, "num_layers": num_layers, "scale": scale,
            "groups": groups, "temporal_mixer": temporal_mixer}
    return params, meta


def _temporal_bimamba(p, x, impl=None, time_axis=None):
    """Apply bidirectional SSM along T for every spatial site.

    (B, T, H, W, C) -> sequences (B*H*W, T, C) -> scan -> back. With
    ``time_axis`` set (inside shard_map with T sharded on that mesh axis)
    the scan is EXACT across shards (nn.ssm.bissm_apply_sharded).
    """
    b, t, h, w, c = x.shape
    seq = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
    if "norm_scale" in p:  # ssd temporal mixer (scalar-per-head decays)
        if time_axis is not None:
            from ..nn.ssm import bissd_apply_sharded

            y = bissd_apply_sharded(p, seq, axis_name=time_axis)
        else:
            from ..nn.ssm import bissd_apply

            # use_pallas=False: the chunked SSD kernels block for
            # long-L/small-b; at this orientation (b=B*H*W, L=T) the
            # single-chunk jnp matmul form is the right lowering.
            y = bissd_apply(p, seq, use_pallas=False)
    elif time_axis is not None:
        from ..nn.ssm import bissm_apply_sharded

        y = bissm_apply_sharded(p, seq, axis_name=time_axis)
    else:
        y = bissm_apply(p, seq)
    return y.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)


def _multi_scale(params, feats):
    """Cross-scale fusion (reference CrossScaleFusion,
    fast_mamba_vsr_handler.py:167-213): pooled branches re-upsampled and fused."""
    b, t, h, w, c = feats.shape
    x2 = jax.lax.reduce_window(
        feats, 0.0, jax.lax.add, (1, 1, 2, 2, 1), (1, 1, 2, 2, 1), "VALID"
    ) / 4.0
    x4 = jax.lax.reduce_window(
        x2, 0.0, jax.lax.add, (1, 1, 2, 2, 1), (1, 1, 2, 2, 1), "VALID"
    ) / 4.0
    x2 = _sepconv3d_apply(params["ms_down2"], x2)
    x4 = _sepconv3d_apply(params["ms_down4"], x4)
    x2 = resize(x2, (h, w), method="linear")
    x4 = resize(x4, (h, w), method="linear")
    cat = jnp.concatenate([feats, x2, x4], axis=-1)
    return nn.conv3d_apply(params["ms_fuse"], cat)


def apply(params, clip: jnp.ndarray, scale: int = 4,
          scan_impl: str | None = None,
          time_axis: str | None = None) -> jnp.ndarray:
    """(B, T, H, W, 3) in [0,1] -> (B, T, scale*H, scale*W, 3).

    ``time_axis``: name of a mesh axis the T dimension is sharded over
    (call inside shard_map) — the temporal scans and the final temporal
    conv then run EXACTLY across shards (prefix-combine + frame halos),
    unlike halo-overlap approximation.
    """
    x = clip
    feats = _sepconv3d_apply(params["embed1"], x)
    feats = jax.nn.silu(feats)
    feats = _sepconv3d_apply(params["embed2"], feats)

    feats = feats + _multi_scale(params, feats)

    skip = feats
    for i, layer in enumerate(params["layers"]):
        h = nn.layer_norm_apply(layer["norm"], feats)
        h = _temporal_bimamba(layer["bimamba"], h, impl=scan_impl,
                              time_axis=time_axis)
        feats = feats + h
        s = nn.conv3d_apply(layer["spatial_dw"], feats,
                            groups=feats.shape[-1])
        feats = feats + nn.conv3d_apply(layer["spatial_pw"], jax.nn.silu(s))
        if i % 2 == 1:
            # Every-2nd-layer skip, 0.1-scaled (reference
            # fast_mamba_vsr_handler.py:110-126).
            feats = feats + 0.1 * skip
            skip = feats

    feats = jax.nn.silu(_sepconv3d_apply(params["refine"], feats))
    res = nn.conv3d_apply(params["head"], feats)  # (B,T,H,W,3*s*s)
    res = pixel_shuffle(res, scale)

    base = resize(x, (x.shape[2] * scale, x.shape[3] * scale),
                  method="cubic", antialias=False)
    out = base + res
    # 0.1-scaled temporal residual (reference EfficientUpsampler,
    # fast_mamba_vsr_handler.py:215-270).
    out = out + 0.1 * _temporal_conv(params["temporal"], out, time_axis)
    return jnp.clip(out, 0.0, 1.0)


def _temporal_conv(p, out, time_axis):
    """The (3,1,1) temporal conv; under T-sharding, exchange 1-frame halos
    (zeroed at global edges to match the unsharded zero padding)."""
    if time_axis is None:
        return nn.conv3d_apply(p, out)
    from ..parallel.temporal import halo_exchange_time

    n = jax.lax.axis_size(time_axis)
    idx = jax.lax.axis_index(time_axis)
    oh = halo_exchange_time(out, 1, axis_name=time_axis)
    oh = oh.at[:, :1].multiply((idx != 0).astype(out.dtype))
    oh = oh.at[:, -1:].multiply((idx != n - 1).astype(out.dtype))
    conv = nn.conv3d_apply(p, oh)
    return conv[:, 1:-1]
