"""Convolution primitives in channels-last layouts.

Layouts: images ``(B, H, W, C)``; clips ``(B, T, H, W, C)``. XLA maps these
convs directly onto the MXU; bf16 inputs with fp32 accumulation. The reference
builds everything from torch Conv3d/Conv2d (e.g. reference vsrm_handler.py:108,
fast_mamba_vsr_handler.py:136-165 separable conv3d).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv2d", "conv3d", "depthwise_conv2d", "depthwise_conv1d", "conv_transpose3d"]


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
