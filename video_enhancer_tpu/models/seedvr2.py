"""SeedVR2: one-step diffusion video restoration.

TPU-first redesign of the reference (reference
models/enhancement/zeroshot/seedvr2_handler.py:104-274): add noise at a fixed
timestep t=500, feed [clean, noisy] (6 channels) to the 3D UNet, recover x0,
then a temporal-consistency module (temporal attention + lightweight flow
warp + conv3d fusion) and quality-encoder conditioning. Same-resolution
restoration (scale 1). Deterministic noise (per-call seed) so restoration is
reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn
from ..ops.attention import attention_ref
from ..ops.warp import flow_warp
from .diffusion import make_schedule, unet_apply, unet_init

__all__ = ["init", "apply", "default_config"]

FIXED_T = 500  # reference seedvr2_handler.py:108-110


def default_config():
    return {"base_channels": 32, "channel_mult": (1, 2, 4), "heads": 4}


def _flownet_init(key, dim=16):
    """LightweightFlowNet (reference seedvr2_handler.py:133-248): 3 convs
    frame-pair -> flow."""
    ks = jax.random.split(key, 3)
    return {
        "c1": nn.conv2d_init(ks[0], 3, 3, 6, dim),
        "c2": nn.conv2d_init(ks[1], 3, 3, dim, dim),
        "c3": nn.conv2d_init(ks[2], 3, 3, dim, 2, zero=True),
    }


def _flownet_apply(p, a, b):
    """(B,H,W,3) pair -> (B,H,W,2) flow (zero-init: starts as no motion)."""
    x = jnp.concatenate([a, b], axis=-1)
    h = jax.nn.relu(nn.conv2d_apply(p["c1"], x))
    h = jax.nn.relu(nn.conv2d_apply(p["c2"], h))
    return nn.conv2d_apply(p["c3"], h)


def _tc_init(key, heads=4, dim=32):
    ks = jax.random.split(key, 5)
    return {
        "proj_in": nn.conv3d_init(ks[0], 1, 1, 1, 3, dim),
        "qkv": nn.dense_init(ks[1], dim, 3 * dim, bias=False),
        "attn_out": nn.dense_init(ks[2], dim, dim),
        "flow": _flownet_init(ks[3]),
        "fuse": nn.conv3d_init(ks[4], 3, 1, 1, dim + 3, 3, zero=True),
    }


def _tc_apply(p, clip, heads=4):
    """Temporal consistency: per-site temporal MHA + flow-warped neighbor
    fusion, residual into the clip."""
    b, t, h, w, c = clip.shape
    feats = nn.conv3d_apply(p["proj_in"], clip)
    d = feats.shape[-1]
    seq = feats.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, d)
    q, k, v = jnp.split(nn.dense_apply(p["qkv"], seq), 3, axis=-1)

    def mh(z):
        return z.reshape(z.shape[0], t, heads, d // heads).transpose(0, 2, 1, 3)

    a = attention_ref(mh(q), mh(k), mh(v))
    a = a.transpose(0, 2, 1, 3).reshape(b * h * w, t, d)
    seq = seq + nn.dense_apply(p["attn_out"], a)
    feats = seq.reshape(b, h, w, t, d).transpose(0, 3, 1, 2, 4)

    # Warp each previous frame onto the current one with the light flow net.
    prev = jnp.concatenate([clip[:, :1], clip[:, :-1]], axis=1)
    flow = _flownet_apply(
        p["flow"],
        clip.reshape(b * t, h, w, c),
        prev.reshape(b * t, h, w, c),
    )
    warped = flow_warp(prev.reshape(b * t, h, w, c),
                       flow.astype(clip.dtype)).reshape(b, t, h, w, c)

    fused = nn.conv3d_apply(
        p["fuse"], jnp.concatenate([feats, warped], axis=-1)
    )
    return clip + fused


def init(key, base_channels: int = 32, channel_mult=(1, 2, 4),
         heads: int = 4, num_timesteps: int = 1000):
    ks = jax.random.split(key, 3)
    unet, unet_meta = unet_init(
        ks[0], in_channels=6, out_channels=3, base=base_channels,
        channel_mult=channel_mult,
    )
    params = {
        "unet": unet,
        "tc": _tc_init(ks[1], heads=heads),
        # QualityEncoder (reference seedvr2_handler.py:250-274): clip stats
        # -> timestep offset conditioning.
        "quality": nn.mlp_init(ks[2], 4, 32, 1),
    }
    meta = {**unet_meta, "heads": heads, "num_timesteps": num_timesteps}
    return params, meta


def apply(params, clip: jnp.ndarray, seed: int = 0,
          heads: int = 4, num_steps: int = 1) -> jnp.ndarray:
    """(B, T, H, W, 3) in [0,1] -> restored clip, same shape.

    ``num_steps > 1`` runs the full DDIM loop (diffusion.sample_loop) from
    the quality-conditioned start timestep instead of the production
    one-step restoration.
    """
    b = clip.shape[0]
    sched = make_schedule()

    x = clip * 2.0 - 1.0  # [-1, 1] diffusion domain

    # Quality conditioning shifts the effective timestep: cleaner input ->
    # smaller t -> lighter restoration.
    stats = jnp.stack(
        [
            jnp.mean(x, axis=(1, 2, 3, 4)),
            jnp.std(x, axis=(1, 2, 3, 4)),
            jnp.mean(jnp.abs(x[:, 1:] - x[:, :-1]), axis=(1, 2, 3, 4))
            if x.shape[1] > 1 else jnp.zeros((b,), x.dtype),
            jnp.max(jnp.abs(x), axis=(1, 2, 3, 4)),
        ],
        axis=-1,
    )
    t_shift = 200.0 * jnp.tanh(
        nn.mlp_apply(params["quality"], stats)[..., 0].astype(jnp.float32)
    )
    t = jnp.clip(FIXED_T + t_shift, 1, sched.num_train_timesteps - 1).astype(
        jnp.int32
    )

    if num_steps > 1:
        from .diffusion import sample_loop

        x0 = sample_loop(params["unet"], x, sched, num_steps=num_steps,
                         start_t=FIXED_T, seed=seed)
    else:
        noise = jax.random.normal(jax.random.PRNGKey(seed), x.shape, x.dtype)
        noisy = sched.add_noise(x, noise, t)

        model_in = jnp.concatenate([x, noisy], axis=-1)  # (B,T,H,W,6)
        eps = unet_apply(params["unet"], model_in, t)
        x0 = sched.pred_x0(noisy, eps.astype(jnp.float32), t)

    restored = (x0 + 1.0) / 2.0
    restored = _tc_apply(params["tc"], restored.astype(clip.dtype), heads)
    return jnp.clip(restored, 0.0, 1.0)
