"""Attention: jnp reference + blockwise (flash) Pallas kernel.

The reference computes full-matrix attention everywhere: (T*H*W)^2 self
attention inside the diffusion UNet (reference diffusion_video_unet.py:92-126),
DiT multi-head attention (reference video_transformer.py:36-76), and a
*per-pixel Python loop* of temporal attention (reference
ea_mamba_blocks.py:260-276). Here attention is one op:

- ``attention_ref``     jnp einsum + softmax (fp32 logits), optional bias/mask
- ``flash_attention``   Pallas online-softmax blockwise kernel; O(L) memory,
                        never materializes the (Lq, Lk) score matrix in HBM
- ``attention``         dispatcher (flash on TPU for long sequences)

Layout: ``q (B, H, Lq, Dh)``, ``k/v (B, H, Lk, Dh)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.flops import record as flop_record

__all__ = ["attention", "attention_ref", "flash_attention",
           "site_attention", "window_attention",
           "window_attention_diffable"]


def attention_ref(q, k, v, bias=None, scale: float | None = None):
    """Reference attention. bias broadcastable to (B, H, Lq, Lk)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Flash kernel
# ---------------------------------------------------------------------------

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale, n_k, block_k, lk_actual):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:, :] = jnp.full_like(m_scr[:, :], _NEG_INF)
        l_scr[:, :] = jnp.zeros_like(l_scr[:, :])
        acc_scr[:, :] = jnp.zeros_like(acc_scr[:, :])

    q = q_ref[0].astype(jnp.float32)          # (BQ, Dh)
    k = k_ref[0].astype(jnp.float32)          # (BK, Dh)
    v = v_ref[0].astype(jnp.float32)          # (BK, Dh)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (BQ, BK)

    # Mask out key padding (when Lk is not a multiple of block_k).
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < lk_actual, s, _NEG_INF)

    m_prev = m_scr[:, :]                       # (BQ, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                     # (BQ, BK)

    l_new = l_scr[:, :] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:, :] = acc_scr[:, :] * alpha + jnp.dot(
        p, v, preferred_element_type=jnp.float32
    )
    m_scr[:, :] = m_new
    l_scr[:, :] = l_new

    @pl.when(ki == n_k - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:, :] / jnp.maximum(l_scr[:, :], 1e-30)).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_impl(q, k, v, scale, block_q, block_k, interpret):
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    bh = B * H
    qf = q.reshape(bh, Lq, Dh)
    kf = k.reshape(bh, Lk, Dh)
    vf = v.reshape(bh, Lk, Dh)

    pad_q = (-Lq) % block_q
    pad_k = (-Lk) % block_k
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))
    Lqp, Lkp = Lq + pad_q, Lk + pad_k
    n_q, n_k = Lqp // block_q, Lkp // block_k

    kernel = functools.partial(
        _flash_kernel, scale=scale, n_k=n_k, block_k=block_k, lk_actual=Lk
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh), lambda b, qi, ki: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, Lqp, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :Lq].reshape(B, H, Lq, Dh)


def flash_attention(q, k, v, scale: float | None = None,
                    block_q: int = 1024, block_k: int = 1024,
                    interpret: bool | None = None):
    """Blockwise attention, O(Lq*Dh) memory. No bias/causal (dense video)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, Lq, Dh = q.shape
    flop_record(4.0 * B * H * Lq * k.shape[2] * Dh)

    def _clamp(block, length):
        # Block must not exceed the (padded) sequence; keep sublane alignment.
        return min(block, max(16, -(-length // 16) * 16))

    block_q = _clamp(block_q, q.shape[2])
    block_k = _clamp(block_k, k.shape[2])
    return _flash_impl(q, k, v, float(scale), block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diffable(q, k, v, scale):
    """Differentiable flash attention: Pallas forward, reference-formula
    backward (the kernel defines no JVP; the recomputing backward is exact
    and keeps training through attention on the TPU fast path)."""
    return flash_attention(q, k, v, scale=scale)


def _flash_fwd(q, k, v, scale):
    return _flash_diffable(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    _, vjp = jax.vjp(lambda *a: attention_ref(*a, scale=scale), *res)
    return vjp(g)


_flash_diffable.defvjp(_flash_fwd, _flash_bwd)


def attention(q, k, v, bias=None, scale: float | None = None):
    """Dispatch: flash kernel on TPU when unbiased and long; else reference."""
    long_seq = q.shape[2] >= 256 and k.shape[2] >= 256
    if bias is None and long_seq and jax.default_backend() == "tpu":
        if scale is None:
            scale = q.shape[-1] ** -0.5
        return _flash_diffable(q, k, v, float(scale))
    return attention_ref(q, k, v, bias=bias, scale=scale)


# ---------------------------------------------------------------------------
# Windowed (short-sequence, biased) attention kernel
# ---------------------------------------------------------------------------


def _window_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, heads):
    q = q_ref[...].astype(jnp.float32)        # (G, N, D)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale        # (G, N, N)
    g, n, _ = s.shape
    bias = b_ref[...].astype(jnp.float32)     # (heads, N, N)
    s = (s.reshape(g // heads, heads, n, n) + bias[None]).reshape(g, n, n)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[...] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "group", "interpret"))
def _window_impl(q, k, v, bias, heads, scale, group, interpret):
    nw, h, n, d = q.shape
    bh = nw * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)
    pad = (-bh) % group
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0), (0, 0)))
        kf = jnp.pad(kf, ((0, pad), (0, 0), (0, 0)))
        vf = jnp.pad(vf, ((0, pad), (0, 0), (0, 0)))
    kernel = functools.partial(_window_kernel, scale=scale, heads=heads)
    out = pl.pallas_call(
        kernel,
        grid=((bh + pad) // group,),
        in_specs=[
            pl.BlockSpec((group, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh + pad, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(qf, kf, vf, bias)
    return out[:bh].reshape(nw, h, n, d)


def window_attention(q, k, v, bias, scale: float | None = None,
                     group: int = 16, interpret: bool | None = None):
    """Batched short-sequence MHA with a shared per-head additive bias —
    the shifted-window attention shape (models/rvrt.py: thousands of
    128-token windows, dh 16, relative-position bias per head).

    ``q/k/v (nW, heads, N, Dh)``, ``bias (heads, N, N)`` shared across
    windows. Unlike ``flash_attention`` (one long sequence per grid row,
    online softmax) this kernel fuses a GROUP of whole windows per grid
    step: N is small, so each window's logits live entirely in VMEM and
    the fp32 (N, N) score tensor never round-trips HBM — which is where
    the XLA path spends its time (rvrt: ~966 MB of logits through softmax
    per forward, scripts/profile_ablate.py round-5 log). Grouping windows
    amortizes grid overhead; ``group`` must be a multiple of ``heads`` so
    each block's head pattern tiles the bias.
    """
    nw, h, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    group = max(h, (group // h) * h)
    flop_record(4.0 * nw * h * n * n * d)
    return _window_impl(q, k, v, bias, h, float(scale), group, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def window_attention_diffable(q, k, v, bias, scale):
    """window_attention with a reference-formula backward (the kernel
    defines no JVP; rvrt trains through this — bias included, the
    relative-position table is a learned parameter)."""
    return window_attention(q, k, v, bias, scale=scale)


def _window_fwd(q, k, v, bias, scale):
    return window_attention_diffable(q, k, v, bias, scale), (q, k, v, bias)


def _window_bwd(scale, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda qq, kk, vv, bb: attention_ref(qq, kk, vv, bias=bb[None],
                                             scale=scale),
        q, k, v, bias)
    return vjp(g)


window_attention_diffable.defvjp(_window_fwd, _window_bwd)


def site_attention_ref(q, k, v, heads: int):
    """Per-site short-sequence MHA in broadcast (lane-preserving) form.

    ``q (N, T, C)``, ``k/v (N, Tg, C)`` -> ``(N, T, C)``. For tiny T and
    dh = C/heads far below the 128-lane tile, per-head matmul layouts run
    the MXU at a fraction of its lane width (measured ~10x slower than
    this form at N = B*H*W on v5e — see models/vsrm.py:_temporal_mix).
    All products stay elementwise with C minor; identical math to
    ``attention_ref`` up to fp reduction order.
    """
    n, t, c = q.shape
    tg = k.shape[1]
    dh = c // heads
    prod = (q[:, :, None, :] * k[:, None, :, :]).reshape(n, t, tg, heads, dh)
    scores = prod.sum(-1).astype(jnp.float32)             # (N,T,Tg,h)
    probs = jax.nn.softmax(scores / jnp.sqrt(jnp.float32(dh)),
                           axis=2).astype(v.dtype)
    pc = jnp.repeat(probs, dh, axis=-1)                   # (N,T,Tg,C)
    return (pc * v[:, None, :, :]).sum(axis=2)            # (N,T,C)


def site_attention(q, k, v, heads: int):
    """Per-site short-T MHA in the XLA broadcast form (the one
    implementation; see ``site_attention_ref`` for the layout rationale).

    Two fused Pallas kernels were built and measured against it on v5e at
    the VSRM shape (57600, 7, 64) heads=4 and BOTH lost to XLA's fusion
    of the broadcast form (3.6 ms): a lane-masked per-head variant
    (10.2 ms — heads-times redundant VPU work) and a dh-blocked variant
    reducing head slices with tiny 0/1 matmuls (13.2 ms — MXU passes with
    a 4-lane output dimension are ~free FLOPs but not free cycles). The
    broadcast form keeps C as the lane dimension, every product stays
    elementwise, and XLA fuses it to near the HBM roofline — so the
    round-2 opt-in kernel (VETPU_SITE_ATTN_KERNEL) is retired rather than
    shipped as dead weight."""
    return site_attention_ref(q, k, v, heads)
