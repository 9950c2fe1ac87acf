"""Core layers. Weight layouts are channels-last / HWIO (TPU-native).

Torch-conversion mapping (for loading reference-family checkpoints):
  torch Linear.weight (out, in)            -> ours ``w`` = weight.T (in, out)
  torch ConvNd.weight (out, in, *k)        -> ours ``w`` = permute(*k, in, out)
  norm weight/bias                         -> ``scale``/``bias``
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, conv3d

__all__ = [
    "dense_init", "dense_apply",
    "conv2d_init", "conv2d_apply",
    "conv3d_init", "conv3d_apply",
    "layer_norm_init", "layer_norm_apply",
    "group_norm_init", "group_norm_apply",
    "rms_norm_init", "rms_norm_apply",
    "mlp_init", "mlp_apply",
    "sinusoidal_embedding",
]


def _kaiming_uniform(key, shape, fan_in):
    """Torch's default Linear/Conv init (kaiming_uniform, a=sqrt(5))."""
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def dense_init(key, din: int, dout: int, bias: bool = True, scale: float | None = None):
    kw, kb = jax.random.split(key)
    if scale is None:
        w = _kaiming_uniform(kw, (din, dout), din)
    else:
        w = jax.random.normal(kw, (din, dout), jnp.float32) * scale
    p = {"w": w}
    if bias:
        if scale == 0.0:
            # A zero-scaled layer is a true zero layer (identity residual).
            p["b"] = jnp.zeros((dout,), jnp.float32)
        else:
            bound = math.sqrt(1.0 / din)
            p["b"] = jax.random.uniform(kb, (dout,), jnp.float32, -bound, bound)
    return p


def dense_apply(p, x):
    y = jnp.einsum("...i,io->...o", x, p["w"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def conv2d_init(key, kh: int, kw_: int, cin: int, cout: int, bias: bool = True,
                groups: int = 1, zero: bool = False):
    kw, kb = jax.random.split(key)
    fan_in = kh * kw_ * (cin // groups)
    shape = (kh, kw_, cin // groups, cout)
    w = (jnp.zeros(shape, jnp.float32) if zero
         else _kaiming_uniform(kw, shape, fan_in))
    p = {"w": w}
    if bias:
        bound = math.sqrt(1.0 / fan_in)
        p["b"] = (jnp.zeros((cout,), jnp.float32) if zero
                  else jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound))
    return p


def conv2d_apply(p, x, stride=1, padding="SAME", groups: int = 1):
    return conv2d(x, p["w"].astype(x.dtype), p.get("b"), stride, padding,
                  feature_group_count=groups)


def conv3d_init(key, kt: int, kh: int, kw_: int, cin: int, cout: int,
                bias: bool = True, groups: int = 1, zero: bool = False):
    kw, kb = jax.random.split(key)
    fan_in = kt * kh * kw_ * (cin // groups)
    shape = (kt, kh, kw_, cin // groups, cout)
    w = (jnp.zeros(shape, jnp.float32) if zero
         else _kaiming_uniform(kw, shape, fan_in))
    p = {"w": w}
    if bias:
        bound = math.sqrt(1.0 / fan_in)
        p["b"] = (jnp.zeros((cout,), jnp.float32) if zero
                  else jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound))
    return p


def conv3d_apply(p, x, stride=1, padding="SAME", groups: int = 1):
    return conv3d(x, p["w"].astype(x.dtype), p.get("b"), stride, padding,
                  feature_group_count=groups)


def layer_norm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm_apply(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def rms_norm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32)}


def rms_norm_apply(p, x, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * p["scale"]).astype(x.dtype)


def group_norm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def group_norm_apply(p, x, groups: int, eps: float = 1e-5,
                     axis_name: str | None = None):
    """GroupNorm over channels-last input ``(..., C)``; stats over all
    non-batch spatial dims + channel group (torch semantics for (B,*,C)).

    ``axis_name``: inside shard_map with the clip's T axis sharded, the
    statistics are psum-combined across shards so the normalization is
    exact vs the unsharded op."""
    *lead, c = x.shape
    b = lead[0]
    xf = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    if axis_name is None:
        mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 3), keepdims=True)
    else:
        cnt = xf.shape[1] * xf.shape[3] * jax.lax.axis_size(axis_name)
        s = jax.lax.psum(jnp.sum(xf, axis=(1, 3), keepdims=True), axis_name)
        ss = jax.lax.psum(jnp.sum(xf * xf, axis=(1, 3), keepdims=True),
                          axis_name)
        mu = s / cnt
        var = jnp.maximum(ss / cnt - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y.reshape(*lead, c)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def mlp_init(key, din: int, hidden: int, dout: int | None = None):
    k1, k2 = jax.random.split(key)
    dout = dout or din
    return {"fc1": dense_init(k1, din, hidden), "fc2": dense_init(k2, hidden, dout)}


def mlp_apply(p, x, act=jax.nn.gelu):
    return dense_apply(p["fc2"], act(dense_apply(p["fc1"], x)))


def sinusoidal_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Timestep/position embedding (reference diffusion_video_unet.py:36-49)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb
