"""Convolution primitives in channels-last layouts.

Layouts: images ``(B, H, W, C)``; clips ``(B, T, H, W, C)``. XLA maps these
convs directly onto the MXU; bf16 inputs with fp32 accumulation. The reference
builds everything from torch Conv3d/Conv2d (e.g. reference vsrm_handler.py:108,
fast_mamba_vsr_handler.py:136-165 separable conv3d).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv2d", "conv3d", "depthwise_conv2d", "depthwise_conv1d",
           "depthwise_conv1d_silu", "conv_transpose3d"]


def _tuple(v, n: int) -> tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int | Sequence[int] = 1,
    padding: str | Sequence[tuple[int, int]] = "SAME",
    feature_group_count: int = 1,
) -> jnp.ndarray:
    """``x:(B,H,W,Cin)  w:(kh,kw,Cin/groups,Cout)``."""
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=_tuple(stride, 2),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def conv3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int | Sequence[int] = 1,
    padding: str | Sequence[tuple[int, int]] = "SAME",
    feature_group_count: int = 1,
) -> jnp.ndarray:
    """``x:(B,T,H,W,Cin)  w:(kt,kh,kw,Cin/groups,Cout)``."""
    if (w.shape[1] == w.shape[2] == 1 and feature_group_count == 1
            and x.shape[-1] <= 8 and w.shape[-1] <= 8
            and stride == 1 and padding == "SAME"):
        return _tiny_temporal_conv3d(x, w, b)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=_tuple(stride, 3),
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def _tiny_temporal_conv3d(x, w, b):
    """(kt,1,1) conv with <=8 in/out channels, unrolled to per-(tap,cin)
    channel-broadcast FMAs.

    The lax conv lowering pads channels to the 128-lane tile, so a
    3-channel (3,1,1) conv over an upscaled 8x720p clip measured 7.9 ms —
    42x lane waste on pure VPU work (FastMambaVSR's EfficientUpsampler
    temporal residual, reference fast_mamba_vsr_handler.py:215-270). The
    unrolled form is kt*cin*cout shifted multiply-adds that XLA fuses into
    one traffic-bound pass (~0.6 ms at the same shape). Exact same math."""
    kt, _, _, cin, cout = w.shape
    lo = kt // 2
    t = x.shape[1]
    xf = x.astype(jnp.float32)
    taps = []
    for k in range(kt):
        off = k - lo
        if off == 0:
            taps.append(xf)
        elif off > 0:
            sl = xf[:, off:]
            taps.append(jnp.pad(sl, ((0, 0), (0, off)) + ((0, 0),) * 3))
        else:
            sl = xf[:, :t + off]
            taps.append(jnp.pad(sl, ((0, 0), (-off, 0)) + ((0, 0),) * 3))
    outs = []
    for d in range(cout):
        acc = 0.0 if b is None else b[d].astype(jnp.float32)
        for k in range(kt):
            for c in range(cin):
                acc = acc + taps[k][..., c] * w[k, 0, 0, c, d].astype(
                    jnp.float32)
        outs.append(acc)
    return jnp.stack(outs, axis=-1).astype(x.dtype)


def depthwise_conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int | Sequence[int] = 1,
    padding: str | Sequence[tuple[int, int]] = "SAME",
) -> jnp.ndarray:
    """``w:(kh,kw,1,C)`` — one filter per channel."""
    return conv2d(x, w, b, stride, padding, feature_group_count=x.shape[-1])


def depthwise_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    padding: str | Sequence[tuple[int, int]] = "SAME",
) -> jnp.ndarray:
    """Sequence depthwise conv: ``x:(B,L,C)  w:(k,1,C)``.

    Used by the SSM branch (reference ea_mamba_blocks.py:54-60 uses a
    grouped Conv1d before the selective scan).
    """
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def conv_transpose3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int | Sequence[int] = 2,
    padding: str = "SAME",
) -> jnp.ndarray:
    """Transposed conv for decoder upsampling (reference
    diffusion_video_unet.py up path). ``w:(kt,kh,kw,Cin,Cout)``."""
    out = lax.conv_transpose(
        x,
        w,
        strides=_tuple(stride, 3),
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def _dwconv_silu_kernel(x_ref, hl_ref, hr_ref, w_ref, b_ref, y_ref,
                        *, K, Q):
    """One chunk of silu(depthwise_conv1d(x, SAME)). Blocks: x_ref/y_ref
    (b, Q, C); hl_ref/hr_ref (b, 1, pad, C) halos (the previous chunk's
    tail / next chunk's head, zeros at the ends); w (K, C); b (1, C)."""
    lo = (K - 1) // 2
    hi = K - 1 - lo
    b = x_ref.shape[0]
    C = x_ref.shape[2]
    xf = x_ref[:, :, :].astype(jnp.float32)
    left = hl_ref[:, 0, :, :].astype(jnp.float32)
    right = hr_ref[:, 0, :, :].astype(jnp.float32)
    ext = jnp.concatenate([left[:, left.shape[1] - lo:], xf,
                           right[:, :hi]], axis=1)
    wf = w_ref[:, :].astype(jnp.float32)
    acc = b_ref[0, :].astype(jnp.float32) * jnp.ones((b, Q, 1),
                                                     jnp.float32)
    for j in range(K):
        acc = acc + ext[:, j:j + Q] * wf[j]
    y_ref[:, :, :] = jax.nn.silu(acc).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _dwconv_silu_impl(x, w, b, chunk=256, interpret=False):
    # chunk=512 at (7, L, 160) blows the 16M scoped-VMEM stack (17.5M) --
    # the full-batch (7, Q, C) fp32 ext/acc intermediates live across the
    # unrolled taps. 256 fits.
    import numpy as np

    Bb, L, C = x.shape
    K = w.shape[0]
    lo = (K - 1) // 2
    hi = K - 1 - lo
    pad = max(lo, hi)
    Q = chunk
    pad_l = (-L) % Q
    xq = jnp.pad(x, ((0, 0), (0, pad_l), (0, 0))) if pad_l else x
    nK = (L + pad_l) // Q

    # Per-chunk halos gathered once in XLA: chunk ki needs rows
    # [ki*Q - pad, ki*Q) (left) and [(ki+1)*Q, (ki+1)*Q + pad) (right).
    xp = jnp.pad(xq, ((0, 0), (pad, pad), (0, 0)))
    idx = np.arange(nK)[:, None] * Q + np.arange(pad)[None]
    hl = jnp.take(xp, jnp.asarray(idx), axis=1)            # (b, nK, pad, C)
    hr = jnp.take(xp, jnp.asarray(idx + Q + pad), axis=1)

    y = pl.pallas_call(
        functools.partial(_dwconv_silu_kernel, K=K, Q=Q),
        grid=(nK,),
        in_specs=[
            pl.BlockSpec((Bb, Q, C), lambda ki: (0, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 1, pad, C), lambda ki: (0, ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, 1, pad, C), lambda ki: (0, ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda ki: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, Q, C), lambda ki: (0, ki, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xq.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xq, hl, hr, w.reshape(K, C), b[None, :])
    return y[:, :L]


def _dwconv_silu_ref(x, w, b):
    return jax.nn.silu(depthwise_conv1d(
        x.astype(jnp.float32), w.astype(jnp.float32), b,
        padding="SAME")).astype(x.dtype)


@jax.custom_vjp
def _dwconv_silu_diffable(x, w, b):
    if jax.default_backend() != "tpu":
        return _dwconv_silu_ref(x, w, b)
    return _dwconv_silu_impl(x, w, b)


def _dwconv_silu_fwd(x, w, b):
    return _dwconv_silu_diffable(x, w, b), (x, w, b)


def _dwconv_silu_bwd(res, gy):
    _, vjp = jax.vjp(_dwconv_silu_ref, *res)
    return vjp(gy)


_dwconv_silu_diffable.defvjp(_dwconv_silu_fwd, _dwconv_silu_bwd)


def depthwise_conv1d_silu(x, w, b, interpret=None):
    """silu(depthwise_conv1d(x, w, b, SAME)) as one chunked Pallas pass.

    The grouped-conv lowering measures 4.18 ms at the VSR spatial-stream
    shape (57600x7 tokens, C=160) — ~13x its HBM roofline — because
    ``feature_group_count == C`` tiles one channel per group. This kernel
    streams (b, chunk, C) blocks with per-chunk halos gathered once in
    XLA, so the SAME-padded window never forces overlapping block reads.
    Used by the SSD branch in front of the chunked scans (reference
    ea_mamba_blocks.py:54-60). Differentiable via the composed reference.
    """
    if interpret:
        return _dwconv_silu_impl(x, w, b, interpret=True)
    return _dwconv_silu_diffable(x, w, b)
