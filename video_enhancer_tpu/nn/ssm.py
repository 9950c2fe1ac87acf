"""Selective SSM (Mamba) layer: init/apply over arbitrary sequence axes.

Clean re-specification of the reference's ``EfficientSSM`` (reference
ea_mamba_blocks.py:39-147 — whose Python-loop scan mean-pools dt/x and is the
framework's worst hot spot). Parameterization follows standard Mamba:

    in_proj -> (x, gate); depthwise conv1d over L; SiLU;
    x_proj -> (dt_raw, B, C); dt = softplus(dt_proj(dt_raw) + bias)
    selective scan (ops/scan.py Pallas kernel); y * silu(gate); out_proj

Sequence layout: ``(batch, L, dim)``. The caller chooses what "L" means:
the temporal axis (FastMambaVSR propagation), a flattened spatial raster
(VSRM spatial mixing), etc.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.conv import depthwise_conv1d
from ..ops.scan import selective_scan
from .core import dense_apply, dense_init

__all__ = ["ssm_init", "ssm_apply", "bimamba_init", "bimamba_apply"]


def ssm_init(key, dim: int, state_dim: int = 16, expand: int = 2,
             conv_kernel: int = 4, dt_rank: int | None = None):
    inner = dim * expand
    dt_rank = dt_rank or max(dim // 16, 1)
    ks = jax.random.split(key, 6)
    # S4D-real initialization of A (negative, log-spaced decay rates).
    a = jnp.tile(
        jnp.arange(1, state_dim + 1, dtype=jnp.float32)[None, :], (inner, 1)
    )
    dt_bias = jnp.log(
        jnp.exp(
            jnp.exp(
                jax.random.uniform(ks[4], (inner,), jnp.float32)
                * (math.log(0.1) - math.log(0.001))
                + math.log(0.001)
            )
        )
        - 1.0
        + 1e-9
    )  # inverse-softplus of dt in [1e-3, 1e-1]
    return {
        "in_proj": dense_init(ks[0], dim, 2 * inner, bias=False),
        "conv_w": jax.random.normal(ks[1], (conv_kernel, 1, inner), jnp.float32)
        * (1.0 / math.sqrt(conv_kernel)),
        "conv_b": jnp.zeros((inner,), jnp.float32),
        "x_proj": dense_init(ks[2], inner, dt_rank + 2 * state_dim, bias=False),
        "dt_proj": dense_init(ks[3], dt_rank, inner),
        "dt_bias": dt_bias,
        "A_log": jnp.log(a),
        "D": jnp.ones((inner,), jnp.float32),
        "out_proj": dense_init(ks[5], inner, dim, bias=False),
    }


def ssm_apply(p, x: jnp.ndarray, reverse: bool = False,
              impl: str | None = None) -> jnp.ndarray:
    """x: (B, L, dim) -> (B, L, dim)."""
    inner = p["D"].shape[0]
    state_dim = p["A_log"].shape[1]
    dt_rank = p["x_proj"]["w"].shape[1] - 2 * state_dim

    if reverse:
        x = jnp.flip(x, axis=1)

    xz = dense_apply(p["in_proj"], x)
    u, gate = jnp.split(xz, 2, axis=-1)
    # Causal depthwise conv over L (left-pad so position t sees <= t).
    k = p["conv_w"].shape[0]
    u = depthwise_conv1d(
        u, p["conv_w"].astype(u.dtype), p["conv_b"],
        padding=((k - 1, 0),),
    )
    u = jax.nn.silu(u)

    proj = dense_apply(p["x_proj"], u)
    dt_raw = proj[..., :dt_rank]
    Bmat = proj[..., dt_rank:dt_rank + state_dim]
    Cmat = proj[..., dt_rank + state_dim:]
    dt = jax.nn.softplus(dense_apply(p["dt_proj"], dt_raw) + p["dt_bias"])

    A = -jnp.exp(p["A_log"])
    y, _ = selective_scan(u, dt, A, Bmat, Cmat, p["D"], impl=impl,
                          need_state=False)
    y = y * jax.nn.silu(gate)
    y = dense_apply(p["out_proj"], y)
    if reverse:
        y = jnp.flip(y, axis=1)
    return y


def bimamba_init(key, dim: int, **kw):
    """Bidirectional Mamba (reference BiMambaLayer, ea_mamba_blocks.py:284-362):
    forward + reversed scans, concat, linear fuse."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fwd": ssm_init(k1, dim, **kw),
        "bwd": ssm_init(k2, dim, **kw),
        "fuse": dense_init(k3, 2 * dim, dim),
    }


def bimamba_apply(p, x: jnp.ndarray, impl: str | None = None) -> jnp.ndarray:
    yf = ssm_apply(p["fwd"], x, impl=impl)
    yb = ssm_apply(p["bwd"], x, reverse=True, impl=impl)
    return dense_apply(p["fuse"], jnp.concatenate([yf, yb], axis=-1))
