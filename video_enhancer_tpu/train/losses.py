"""Restoration losses."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["charbonnier_loss", "temporal_loss", "vsr_loss"]


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     eps: float = 1e-3) -> jnp.ndarray:
    """Robust L1 (standard VSR objective)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def temporal_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Match temporal gradients over the T axis of (B, T, H, W, C)."""
    dp = pred[:, 1:] - pred[:, :-1]
    dt = target[:, 1:] - target[:, :-1]
    return charbonnier_loss(dp, dt)


def vsr_loss(pred: jnp.ndarray, target: jnp.ndarray,
             temporal_weight: float = 0.25) -> jnp.ndarray:
    loss = charbonnier_loss(pred, target)
    if pred.ndim == 5 and pred.shape[1] > 1:
        loss = loss + temporal_weight * temporal_loss(pred, target)
    return loss
