"""Temporal context parallelism: shard the clip's T axis across chips.

The reference scales sequence length (frame count) only by host-side
chunking with overlap blending (reference fast_mamba_vsr_handler.py:610-644,
vsrm_handler.py:511-547 — SURVEY.md §2.7). On a TPU mesh the T axis is
sharded instead, with two primitives:

- ``halo_exchange_time``: exchange ``halo`` boundary frames with neighbor
  shards over ICI (ppermute) so temporal convolutions see valid context —
  the distributed equivalent of overlap chunking, but exact;

- ``temporal_parallel_scan``: a distributed *exact* selective scan. Each
  shard scans locally from zero state, shards exchange (decay, state)
  summaries (the total decay product is ``exp(A * sum dt)`` — O(D*N), tiny),
  an exclusive prefix-combine yields each shard's incoming state, and a
  second local scan applies it. 2x local compute, O(K * D * N) comms —
  the Mamba analog of ring attention (SURVEY.md §5 long-context note).

Both are written against a named mesh axis and used inside ``shard_map``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.scan import selective_scan

__all__ = ["halo_exchange_time", "temporal_parallel_scan",
           "ssd_parallel_scan", "make_temporal_scan"]


def halo_exchange_time(x: jnp.ndarray, halo: int, axis_name: str = "time",
                       edge: str = "replicate"):
    """Pad a T-sharded clip with ``halo`` frames from each neighbor.

    x: local shard ``(B, T_loc, ...)``. Returns ``(B, T_loc + 2*halo, ...)``.
    ``edge`` controls the GLOBAL sequence boundary: "replicate" repeats the
    boundary frame (reference pads the same way, ditvr_handler.py:797-801);
    "zero" inserts zero frames — required for exactness against an
    unsharded SAME/zero-padded convolution.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    right_block = x[:, -halo:]
    left_block = x[:, :halo]
    # Send my right block to my right neighbor (it becomes their left halo),
    # and my left block to my left neighbor.
    from_left = jax.lax.ppermute(
        right_block, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_right = jax.lax.ppermute(
        left_block, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    if edge == "zero":
        edge_left = jnp.zeros_like(left_block)
        edge_right = jnp.zeros_like(right_block)
    else:
        edge_left = jnp.broadcast_to(x[:, :1], left_block.shape)
        edge_right = jnp.broadcast_to(x[:, -1:], right_block.shape)
    from_left = jnp.where(idx == 0, edge_left, from_left)
    from_right = jnp.where(idx == n - 1, edge_right, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=1)


def temporal_parallel_scan(x, dt, A, Bmat, C, D, axis_name: str = "time",
                           impl: str | None = None, reverse: bool = False):
    """Exact distributed selective scan over a T-sharded sequence.

    Args are local shards: x, dt ``(B, L_loc, D)``; Bmat, C ``(B, L_loc, N)``;
    A ``(D, N)``, D ``(Dd,)`` replicated. ``reverse=True`` scans the global
    sequence back-to-front (local flips + reversed shard prefix order).
    Returns the local y shard in natural order.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    if reverse:
        x, dt, Bmat, C = (jnp.flip(a, axis=1) for a in (x, dt, Bmat, C))

    # Pass 1: local scan from zero state. The zeros must be marked as
    # device-varying so lax.scan's carry typing matches inside shard_map.
    B_, _, Dd = x.shape
    N = A.shape[1]
    h0 = jax.lax.pcast(jnp.zeros((B_, Dd, N), jnp.float32), (axis_name,),
                       to="varying")
    _, h_local = selective_scan(x, dt, A, Bmat, C, D, h0=h0, impl=impl)

    # Shard summary: total decay a_tot = exp(A * sum_t dt) (B, D, N).
    sum_dt = jnp.sum(dt.astype(jnp.float32), axis=1)          # (B, Dd)
    a_tot = jnp.exp(sum_dt[..., None] * A.astype(jnp.float32)[None])  # (B,D,N)

    # All-gather summaries and prefix-combine (K is tiny: the mesh axis).
    a_all = jax.lax.all_gather(a_tot, axis_name)              # (K, B, D, N)
    h_all = jax.lax.all_gather(h_local, axis_name)            # (K, B, D, N)
    if reverse:
        # Prefix runs from the LAST shard toward the first.
        a_all = jnp.flip(a_all, axis=0)
        h_all = jnp.flip(h_all, axis=0)

    def combine(carry, pair):
        a_k, h_k = pair
        # state after shard k given incoming carry
        return a_k * carry + h_k, carry

    _, carries = jax.lax.scan(combine, jnp.zeros_like(h_local),
                              (a_all, h_all))
    # carries[k] = state entering shard k (exclusive prefix, scan order).
    my_pos = (n - 1 - idx) if reverse else idx
    h_in = carries[my_pos]

    # Pass 2: local scan with the true incoming state.
    y, _ = selective_scan(x, dt, A, Bmat, C, D, h0=h_in, impl=impl)
    if reverse:
        y = jnp.flip(y, axis=1)
    return y


def ssd_parallel_scan(x, dt, A, Bm, Cm, axis_name: str = "time",
                      chunk: int = 64, reverse: bool = False):
    """Exact distributed SSD (Mamba-2) scan over a T-sharded sequence.

    The scalar-per-head-decay analog of ``temporal_parallel_scan``: scan
    state is ``(B, H, N, P)`` with per-head decay ``exp(dt_t * A_h)``.
    Unlike the Mamba-1 version no second scan pass is needed — the
    incoming shard state enters the output linearly, so one einsum adds
    its contribution after the local scan (1x local compute + O(K*H*N*P)
    comms).

    Args are local shards: x ``(B, L_loc, H, P)``; dt ``(B, L_loc, H)``
    (already softplused, fp32); Bm, Cm ``(B, L_loc, N)`` shared across
    heads; A ``(H,)`` replicated. Returns the local y shard WITHOUT the
    D skip (caller adds ``u * D``).
    """
    from ..ops.ssd import ssd_shared

    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    if reverse:
        x, dt, Bm, Cm = (jnp.flip(a, axis=1) for a in (x, dt, Bm, Cm))

    # Local scan from zero state.
    y_local = ssd_shared(x, dt, A, Bm, Cm, chunk=chunk)

    # Local decay prefix g_t = cumsum(dt * A) and the shard's final state
    # h_local = sum_t exp(G - g_t) * dt_t * (B_t (x) x_t).
    dtf = dt.astype(jnp.float32)
    Af = A.astype(jnp.float32)
    g = jnp.cumsum(dtf * Af[None, None, :], axis=1)           # (B, L, H)
    G = g[:, -1]                                              # (B, H)
    w = jnp.exp(G[:, None] - g) * dtf                         # (B, L, H)
    h_local = jnp.einsum("bln,blhp->bhnp", Bm.astype(jnp.float32),
                         w[..., None] * x.astype(jnp.float32))
    a_tot = jnp.exp(G)                                        # (B, H)

    # All-gather (decay, state) summaries; exclusive prefix-combine.
    a_all = jax.lax.all_gather(a_tot, axis_name)              # (K, B, H)
    h_all = jax.lax.all_gather(h_local, axis_name)            # (K, B, H, N, P)
    if reverse:
        a_all = jnp.flip(a_all, axis=0)
        h_all = jnp.flip(h_all, axis=0)

    def combine(carry, pair):
        a_k, h_k = pair
        return a_k[..., None, None] * carry + h_k, carry

    _, carries = jax.lax.scan(combine, jnp.zeros_like(h_local),
                              (a_all, h_all))
    my_pos = (n - 1 - idx) if reverse else idx
    h_in = carries[my_pos]                                    # (B, H, N, P)

    # Incoming-state contribution: y_t += exp(g_t) * C_t . h_in.
    y_corr = (jnp.einsum("bln,bhnp->blhp", Cm.astype(jnp.float32), h_in)
              * jnp.exp(g)[..., None])
    y = y_local + y_corr.astype(y_local.dtype)
    if reverse:
        y = jnp.flip(y, axis=1)
    return y


def make_temporal_scan(mesh: Mesh, impl: str | None = None):
    """Build a jitted T-sharded scan over ``mesh``'s ``time`` axis.

    Returns ``fn(x, dt, A, Bmat, C, D) -> y`` where the sequence axis of
    x/dt/Bmat/C is sharded over ``time`` and y comes back with the same
    sharding.
    """
    from jax import shard_map

    seq = P(None, "time", None)
    rep = P()

    fn = shard_map(
        functools.partial(temporal_parallel_scan, axis_name="time",
                          impl=impl),
        mesh=mesh,
        in_specs=(seq, seq, rep, seq, seq, rep),
        out_specs=seq,
    )
    return jax.jit(fn)
