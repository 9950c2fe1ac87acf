"""Sharded inference: run a clip model with the T axis sharded over chips.

The distributed form of the reference's chunk-with-overlap processing
(reference fast_mamba_vsr_handler.py:560-673): each ``time``-shard extends
its local frames with ``halo`` neighbor frames over ICI
(``halo_exchange_time``), runs the model on the extended chunk, and trims
the halo — so temporal convolutions/attention see real context at shard
boundaries instead of padding. Like the reference's chunking this is exact
for models whose temporal receptive field fits the halo and an
approximation for globally-recurrent ones (use ``temporal_parallel_scan``
inside the model for exactness there).
"""

from __future__ import annotations

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .temporal import halo_exchange_time

__all__ = ["make_sharded_clip_fn"]


def make_sharded_clip_fn(apply_fn, mesh: Mesh, halo: int = 2,
                         batch_axis: str | None = "data",
                         time_axis: str = "time"):
    """Build ``fn(params, clip)`` with clip (B, T, H, W, C) sharded
    B over ``data`` and T over ``time``.

    ``apply_fn(params, clip) -> clip_out`` must preserve T (spatial scale
    may change). T must be divisible by the time-axis size; every local
    shard must have >= halo frames.
    """
    clip_spec = P(batch_axis, time_axis, None, None, None)
    rep = P()

    def local(params, clip_shard):
        ext = halo_exchange_time(clip_shard, halo, axis_name=time_axis)
        out = apply_fn(params, ext)
        return out[:, halo:out.shape[1] - halo]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(rep, clip_spec),
        out_specs=clip_spec,
    )

    @jax.jit
    def run(params, clip):
        return fn(params, clip)

    def wrapper(params, clip):
        n_t = mesh.shape[time_axis]
        if clip.shape[1] % n_t:
            raise ValueError(
                f"T={clip.shape[1]} not divisible by time axis {n_t}")
        if clip.shape[1] // n_t < halo:
            raise ValueError(
                f"local shard {clip.shape[1] // n_t} frames < halo {halo}")
        params_r = jax.device_put(params, NamedSharding(mesh, rep))
        clip_s = jax.device_put(clip, NamedSharding(mesh, clip_spec))
        return run(params_r, clip_s)

    return wrapper
