"""Spatial sharding: split frame height across chips with halo exchange.

The distributed form of the reference's overlap tiling (reference
fast_mamba_vsr_handler.py:728-793, SURVEY.md §2.7 "Spatial sharding (a 2D
form of TP)"): each ``space``-shard holds a horizontal band of every frame,
exchanges ``halo`` boundary rows with its neighbors over ICI, runs the model
on the extended band and trims ``scale * halo`` output rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["halo_exchange_space", "make_spatially_sharded_clip_fn"]


def halo_exchange_space(x: jnp.ndarray, halo: int,
                        axis_name: str = "space") -> jnp.ndarray:
    """Pad an H-sharded clip with ``halo`` rows from each neighbor.

    x: local shard ``(B, T, H_loc, W, C)`` -> ``(B, T, H_loc + 2*halo, W, C)``;
    edge shards replicate their boundary row.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_block = x[:, :, :halo]
    bot_block = x[:, :, -halo:]
    from_top = jax.lax.ppermute(
        bot_block, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_bot = jax.lax.ppermute(
        top_block, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    edge_top = jnp.broadcast_to(x[:, :, :1], top_block.shape)
    edge_bot = jnp.broadcast_to(x[:, :, -1:], bot_block.shape)
    from_top = jnp.where(idx == 0, edge_top, from_top)
    from_bot = jnp.where(idx == n - 1, edge_bot, from_bot)
    return jnp.concatenate([from_top, x, from_bot], axis=2)


def make_spatially_sharded_clip_fn(apply_fn, mesh: Mesh, halo: int = 8,
                                   scale: int = 1,
                                   space_axis: str = "space",
                                   batch_axis: str | None = "data"):
    """Build ``fn(params, clip)`` with clip (B, T, H, W, C) sharded H over
    ``space`` (and B over ``data``). ``apply_fn`` maps H -> scale*H."""
    clip_spec = P(batch_axis, None, space_axis, None, None)
    rep = P()

    def local(params, clip_shard):
        ext = halo_exchange_space(clip_shard, halo, axis_name=space_axis)
        out = apply_fn(params, ext)
        trim = halo * scale
        return out[:, :, trim:out.shape[2] - trim]

    fn = shard_map(local, mesh=mesh, in_specs=(rep, clip_spec),
                   out_specs=clip_spec)

    @jax.jit
    def run(params, clip):
        return fn(params, clip)

    def wrapper(params, clip):
        n_s = mesh.shape[space_axis]
        if clip.shape[2] % n_s:
            raise ValueError(
                f"H={clip.shape[2]} not divisible by space axis {n_s}")
        if clip.shape[2] // n_s < halo:
            raise ValueError(
                f"local band {clip.shape[2] // n_s} rows < halo {halo}")
        params_r = jax.device_put(params, NamedSharding(mesh, rep))
        clip_s = jax.device_put(clip, NamedSharding(mesh, clip_spec))
        return run(params_r, clip_s)

    return wrapper
