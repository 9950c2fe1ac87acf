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
