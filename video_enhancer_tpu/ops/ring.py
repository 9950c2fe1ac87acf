"""Ring attention: sequence-parallel attention over a sharded token axis.

For SHORT sequences (a few frames' tokens) the exact T-sharded models
all-gather keys/values — one collective, simple, fine. For LONG clips the
gathered (B, H, L_global, D) K/V no longer fits per chip; ring attention
keeps K/V sharded and rotates each shard around the mesh axis with
``ppermute`` while queries stay put, folding each visiting block into an
online-softmax accumulator (the flash-attention recurrence, distributed).
Peak memory is O(L_local), comms are K-1 neighbor exchanges on ICI.

Match: the reference's full (T·H·W)^2 attention hot spot
(/root/reference/models/backbones/diffusion/diffusion_video_unet.py:92-126)
and SURVEY §5's long-context note. Used inside shard_map; exact vs the
single-device softmax up to reduction order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ring_attention"]


def ring_attention(q, k, v, axis_name: str, scale: float | None = None):
    """q, k, v: local shards ``(B, H, L_loc, D)`` inside shard_map with the
    global L axis sharded over ``axis_name``. Returns the local output
    shard ``(B, H, L_loc, D)`` of softmax(q K_global^T) V_global.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qf = q.astype(jnp.float32) * scale
    B, H, Lq, D = q.shape

    # Online-softmax accumulator: running max m, normalizer l, output o.
    # Derived from q so the carries are device-varying under shard_map
    # (a plain jnp.zeros is "unvarying" and the loop carry typing rejects
    # mixing it with the varying k/v).
    probe = qf[..., :1] * 0.0
    m0 = probe - jnp.inf
    l0 = probe
    o0 = qf * 0.0

    def step(i, carry):
        m, l, o, k_cur, v_cur = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32))
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        o = o * corr + jnp.einsum("bhqk,bhkd->bhqd", p,
                                  v_cur.astype(jnp.float32))
        # Rotate K/V one hop around the ring (skipped after the last fold).
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return m_new, l, o, k_nxt, v_nxt

    m, l, o, _, _ = jax.lax.fori_loop(0, n, step, (m0, l0, o0, k, v))
    return (o / jnp.maximum(l, 1e-30)).astype(q.dtype)


# Below this many global tokens, one all-gather of K/V is cheaper than
# K-1 ring hops (and the gathered tensor is small anyway).
RING_MIN_TOKENS = 4096


def sharded_attention(q, k, v, heads: int, axis_name: str,
                      min_ring_tokens: int = RING_MIN_TOKENS):
    """Sequence-parallel attention over ``(B, L_loc, C)`` shards.

    Picks the strategy by global sequence length: gather-K/V for short
    sequences, ring attention for long ones. Exact either way.
    """
    b, l_loc, c = q.shape
    dh = c // heads
    n = jax.lax.axis_size(axis_name)

    def mh(z):
        return z.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)

    def unmh(z):
        return z.transpose(0, 2, 1, 3).reshape(b, -1, c)

    if l_loc * n >= min_ring_tokens:
        return unmh(ring_attention(mh(q), mh(k), mh(v), axis_name))
    from .attention import attention

    kg = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
    vg = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    return unmh(attention(mh(q), mh(kg), mh(vg)))
