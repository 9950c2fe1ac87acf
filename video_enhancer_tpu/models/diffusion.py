"""Diffusion backbone: noise scheduler + 3D video UNet.

Re-implements the reference backbone (reference
models/backbones/diffusion/noise_scheduler.py:35-233 — linear/scaled-linear/
cosine betas, add_noise, velocity, DDPM step with epsilon & v prediction —
and diffusion_video_unet.py:36-278 — timestep MLP, ResBlock3D,
AttentionBlock3D, stride-2 down / transpose up, channel_mult). TPU changes:
channels-last NDHWC convs, the (T*H*W)^2 attention runs through the shared
attention op (flash kernel on TPU — SURVEY.md §7 "blockwise from day one").
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from ..nn.core import sinusoidal_embedding
from ..ops.attention import attention, site_attention
from ..ops.conv import conv_transpose3d

__all__ = ["NoiseSchedule", "make_schedule", "unet_init", "unet_apply",
           "sample_loop"]


# ---------------------------------------------------------------------------
# Scheduler (pure dataclass of tables + functions)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int
    prediction_type: str = "epsilon"  # or "v_prediction"

    def add_noise(self, clean, noise, t):
        """q(x_t | x_0): sqrt(a_bar) x0 + sqrt(1-a_bar) eps."""
        a = self.alphas_cumprod[t].astype(clean.dtype)
        while a.ndim < clean.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * clean + jnp.sqrt(1.0 - a) * noise

    def get_velocity(self, clean, noise, t):
        a = self.alphas_cumprod[t].astype(clean.dtype)
        while a.ndim < clean.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * clean

    def pred_x0(self, sample, model_out, t):
        """Recover x0 from the model output at timestep t."""
        a = self.alphas_cumprod[t].astype(sample.dtype)
        while a.ndim < sample.ndim:
            a = a[..., None]
        if self.prediction_type == "epsilon":
            return (sample - jnp.sqrt(1.0 - a) * model_out) / jnp.sqrt(a)
        # v-prediction
        return jnp.sqrt(a) * sample - jnp.sqrt(1.0 - a) * model_out

    def step(self, model_out, t, t_prev, sample):
        """One DDIM-style step t -> t_prev (deterministic, eta=0)."""
        x0 = self.pred_x0(sample, model_out, t)
        a_prev = jnp.where(
            t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0
        ).astype(sample.dtype)
        a = self.alphas_cumprod[t].astype(sample.dtype)
        while a.ndim < sample.ndim:
            a = a[..., None]
            a_prev = a_prev[..., None]
        eps = (sample - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps


def make_schedule(num_timesteps: int = 1000, schedule: str = "cosine",
                  beta_start: float = 8.5e-4, beta_end: float = 1.2e-2,
                  prediction_type: str = "epsilon") -> NoiseSchedule:
    if schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_timesteps)
    elif schedule == "scaled_linear":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_timesteps) ** 2
    elif schedule == "cosine":
        s = 0.008
        ts = np.arange(num_timesteps + 1) / num_timesteps
        f = np.cos((ts + s) / (1 + s) * math.pi / 2) ** 2
        betas = np.clip(1 - f[1:] / f[:-1], 0, 0.999)
    else:
        raise ValueError(f"unknown schedule {schedule}")
    alphas = 1.0 - betas
    return NoiseSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(np.cumprod(alphas), jnp.float32),
        num_train_timesteps=num_timesteps,
        prediction_type=prediction_type,
    )


def sample_loop(params, cond: jnp.ndarray, sched: NoiseSchedule,
                num_steps: int = 20, start_t: int | None = None,
                seed: int = 0, t_dim: int = 128):
    """Multi-step DDPM restoration (the reference scheduler's set_timesteps
    + step loop, noise_scheduler.py:147-233; the one-step t=500 path in
    models/seedvr2.py is the production default).

    cond: the clean/degraded conditioning clip (B, T, H, W, 3) in [-1, 1];
    the UNet input is [cond, sample] (6 channels). Returns x0 in [-1, 1].
    """
    start_t = start_t or (sched.num_train_timesteps // 2)
    # Evenly spaced timesteps start_t -> 0 (reference set_timesteps).
    ts = jnp.linspace(start_t, 0, num_steps + 1).astype(jnp.int32)

    b = cond.shape[0]
    noise = jax.random.normal(jax.random.PRNGKey(seed), cond.shape,
                              cond.dtype)
    t0 = jnp.full((b,), start_t, jnp.int32)
    sample = sched.add_noise(cond, noise, t0)

    def body(i, sample):
        t = jnp.full((b,), ts[i], jnp.int32)
        t_prev = jnp.full((b,), ts[i + 1], jnp.int32)
        model_in = jnp.concatenate([cond, sample], axis=-1)
        eps = unet_apply(params, model_in, t, t_dim=t_dim)
        return sched.step(eps.astype(jnp.float32), t, t_prev, sample)

    sample = jax.lax.fori_loop(0, num_steps, body, sample)
    return sample


# ---------------------------------------------------------------------------
# UNet3D
# ---------------------------------------------------------------------------


def _resblock_init(key, cin, cout, t_dim):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": nn.group_norm_init(cin),
        "conv1": nn.conv3d_init(ks[0], 3, 3, 3, cin, cout),
        "t_proj": nn.dense_init(ks[1], t_dim, cout),
        "norm2": nn.group_norm_init(cout),
        "conv2": nn.conv3d_init(ks[2], 3, 3, 3, cout, cout, zero=True),
    }
    if cin != cout:
        p["skip"] = nn.conv3d_init(ks[3], 1, 1, 1, cin, cout)
    return p


def _c3_sharded(p, x, time_axis, stride=1):
    """conv3d with exact T-sharding: T-kernel-3 convs exchange a 1-frame
    halo (zero frames at global edges, matching SAME zero padding) and trim
    the halo rows from the output. T stride is always 1 here."""
    if time_axis is None or p["w"].shape[0] == 1:
        return nn.conv3d_apply(p, x, stride=stride)
    from ..parallel.temporal import halo_exchange_time

    xe = halo_exchange_time(x, 1, axis_name=time_axis, edge="zero")
    out = nn.conv3d_apply(p, xe, stride=stride)
    return out[:, 1:out.shape[1] - 1]


def _resblock_apply(p, x, t_emb, groups=8, time_axis=None):
    h = jax.nn.silu(nn.group_norm_apply(p["norm1"], x, groups,
                                        axis_name=time_axis))
    h = _c3_sharded(p["conv1"], h, time_axis)
    h = h + nn.dense_apply(p["t_proj"], t_emb)[:, None, None, None, :]
    h = jax.nn.silu(nn.group_norm_apply(p["norm2"], h, groups,
                                        axis_name=time_axis))
    h = _c3_sharded(p["conv2"], h, time_axis)
    skip = nn.conv3d_apply(p["skip"], x) if "skip" in p else x
    return skip + h


def _attnblock_init(key, c):
    ks = jax.random.split(key, 2)
    return {
        "norm": nn.group_norm_init(c),
        "qkv": nn.dense_init(ks[0], c, 3 * c, bias=False),
        "proj": nn.dense_init(ks[1], c, c, scale=0.0),
    }


def _attnblock_apply(p, x, groups=8, heads=4, time_axis=None):
    """Factorized space-time attention.

    TPU-first redesign of the reference's full (T*H*W)^2 attention
    (reference diffusion_video_unet.py:92-126): one shared qkv projection
    feeds (a) spatial attention within each frame as a SINGLE head at the
    full 128-lane head width (dh = c; per-head dh = c/heads would run the
    flash kernel's matmuls at a quarter of the MXU lane width — measured
    3.8x slower at equal FLOPs on v5e), plus (b) broadcast-form temporal
    attention at every site (ops/attention.py:site_attention). The two
    results sum into one output projection. Global receptive field is kept
    through the axis composition at ~T x fewer score FLOPs, and the spatial
    half is embarrassingly T-parallel: under T-sharding it needs ZERO
    communication (frames are device-local), vs the ring pass the full
    attention needed."""
    b, t, h, w, c = x.shape
    n = nn.group_norm_apply(p["norm"], x, groups, axis_name=time_axis)
    qkv = nn.dense_apply(p["qkv"], n.reshape(b, t * h * w, c))
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def frames(z):
        return z.reshape(b * t, 1, h * w, c)

    a_sp = attention(frames(q), frames(k), frames(v))
    a_sp = a_sp.reshape(b, t * h * w, c)

    def sites(z):
        return (z.reshape(b, t, h, w, c).transpose(0, 2, 3, 1, 4)
                .reshape(b * h * w, t, c))

    qt, kt, vt = sites(q), sites(k), sites(v)
    if time_axis is not None:
        kt = jax.lax.all_gather(kt, time_axis, axis=1, tiled=True)
        vt = jax.lax.all_gather(vt, time_axis, axis=1, tiled=True)
    a_t = site_attention(qt, kt, vt, heads)
    a_t = (a_t.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
           .reshape(b, t * h * w, c))
    return x + nn.dense_apply(p["proj"], a_sp + a_t).reshape(b, t, h, w, c)


def unet_init(key, in_channels: int = 6, out_channels: int = 3,
              base: int = 32, channel_mult=(1, 2, 4), t_dim: int = 128,
              attn_levels=(2,)):
    chans = [base * m for m in channel_mult]
    ks = iter(jax.random.split(key, 64))
    params = {
        "t_mlp": nn.mlp_init(next(ks), t_dim, 4 * t_dim, t_dim),
        "stem": nn.conv3d_init(next(ks), 3, 3, 3, in_channels, chans[0]),
        "down": [],
        "mid1": _resblock_init(next(ks), chans[-1], chans[-1], t_dim),
        "mid_attn": _attnblock_init(next(ks), chans[-1]),
        "mid2": _resblock_init(next(ks), chans[-1], chans[-1], t_dim),
        "up": [],
        "out_norm": nn.group_norm_init(chans[0]),
        "out_conv": nn.conv3d_init(next(ks), 3, 3, 3, chans[0], out_channels,
                                   zero=True),
    }
    cin = chans[0]
    for lvl, cout in enumerate(chans):
        stage = {"res": _resblock_init(next(ks), cin, cout, t_dim)}
        if lvl in attn_levels:
            stage["attn"] = _attnblock_init(next(ks), cout)
        if lvl < len(chans) - 1:
            stage["down"] = nn.conv3d_init(next(ks), 3, 3, 3, cout, cout)
        params["down"].append(stage)
        cin = cout
    for lvl in reversed(range(len(chans))):
        cout = chans[lvl]
        stage = {
            "res": _resblock_init(next(ks), cin + cout, cout, t_dim),
        }
        if lvl in attn_levels:
            stage["attn"] = _attnblock_init(next(ks), cout)
        if lvl > 0:
            stage["up"] = {
                "w": jax.random.normal(
                    next(ks), (3, 3, 3, cout, cout), jnp.float32
                ) * 0.02,
                "b": jnp.zeros((cout,), jnp.float32),
            }
        params["up"].append(stage)
        cin = cout
    meta = {"base": base, "channel_mult": tuple(channel_mult), "t_dim": t_dim}
    return params, meta


def unet_apply(params, x, t, t_dim: int = 128, groups: int = 8,
               time_axis: str | None = None):
    """x: (B, T, H, W, in_ch); t: (B,) int timesteps -> (B, T, H, W, out).

    ``time_axis``: exact T-sharded execution inside shard_map — halo'd
    temporal convs, psum'd GroupNorm stats, gathered-K/V attention."""
    t_emb = sinusoidal_embedding(t.astype(jnp.float32), t_dim).astype(x.dtype)
    t_emb = nn.mlp_apply(params["t_mlp"], t_emb, act=jax.nn.silu)

    h = _c3_sharded(params["stem"], x, time_axis)
    skips = []
    for stage in params["down"]:
        h = _resblock_apply(stage["res"], h, t_emb, groups, time_axis)
        if "attn" in stage:
            h = _attnblock_apply(stage["attn"], h, groups,
                                 time_axis=time_axis)
        skips.append(h)
        if "down" in stage:
            h = _c3_sharded(stage["down"], h, time_axis, stride=(1, 2, 2))

    h = _resblock_apply(params["mid1"], h, t_emb, groups, time_axis)
    h = _attnblock_apply(params["mid_attn"], h, groups, time_axis=time_axis)
    h = _resblock_apply(params["mid2"], h, t_emb, groups, time_axis)

    for stage in params["up"]:
        skip = skips.pop()
        h = _resblock_apply(
            stage["res"], jnp.concatenate([h, skip], axis=-1), t_emb,
            groups, time_axis
        )
        if "attn" in stage:
            h = _attnblock_apply(stage["attn"], h, groups,
                                 time_axis=time_axis)
        if "up" in stage:
            if time_axis is None:
                h = conv_transpose3d(
                    h, stage["up"]["w"].astype(h.dtype), stage["up"]["b"],
                    stride=(1, 2, 2),
                )
            else:
                from ..parallel.temporal import halo_exchange_time

                he = halo_exchange_time(h, 1, axis_name=time_axis,
                                        edge="zero")
                he = conv_transpose3d(
                    he, stage["up"]["w"].astype(h.dtype), stage["up"]["b"],
                    stride=(1, 2, 2),
                )
                h = he[:, 1:he.shape[1] - 1]

    h = jax.nn.silu(nn.group_norm_apply(params["out_norm"], h, groups,
                                        axis_name=time_axis))
    return _c3_sharded(params["out_conv"], h, time_axis)
