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

__all__ = ["make_sharded_clip_fn", "make_mesh_sharded_clip_fn",
           "make_exact_sharded_fmv", "make_exact_sharded_vsrm",
           "make_exact_sharded_seedvr2", "make_exact_sharded_ditvr"]


def _make_exact_sharded(local_apply, mesh: Mesh, time_axis: str = "time"):
    """shard_map wrapper shared by the exact T-sharded model factories."""
    clip_spec = P(None, time_axis, None, None, None)
    rep = P()
    fn = shard_map(local_apply, mesh=mesh, in_specs=(rep, clip_spec),
                   out_specs=clip_spec)
    run = jax.jit(fn)

    def wrapper(params, clip):
        n_t = mesh.shape[time_axis]
        if clip.shape[1] % n_t:
            raise ValueError(
                f"T={clip.shape[1]} not divisible by time axis {n_t}")
        params_r = jax.device_put(params, NamedSharding(mesh, rep))
        clip_s = jax.device_put(clip, NamedSharding(mesh, clip_spec))
        return run(params_r, clip_s)

    return wrapper


def make_exact_sharded_vsrm(mesh: Mesh, scale: int = 4, heads: int = 4,
                            time_axis: str = "time"):
    """EXACT T-sharded VSRM: gathered-K/V temporal attention, distributed
    prefix-combine temporal scans, halo'd temporal conv — sharded output
    equals single-device up to reduction order."""
    from ..models import vsrm

    def local(params, shard):
        return vsrm.apply(params, shard, scale=scale, heads=heads,
                          scan_impl="ref", time_axis=time_axis)

    return _make_exact_sharded(local, mesh, time_axis)


def make_exact_sharded_seedvr2(mesh: Mesh, time_axis: str = "time"):
    """EXACT T-sharded SeedVR2 (one-step restore): halo'd 3-D convs
    throughout the UNet + TC module, gathered-K/V attention, ppermute'd
    previous-frame stream."""
    from ..models import seedvr2

    def local(params, shard):
        return seedvr2.apply(params, shard, time_axis=time_axis)

    return _make_exact_sharded(local, mesh, time_axis)


def make_exact_sharded_ditvr(mesh: Mesh, heads: int = 6,
                             time_axis: str = "time"):
    """EXACT T-sharded DiTVR: per-shard positional-embedding offsets and
    gathered-K/V attention over the global token sequence."""
    import jax.numpy as jnp

    from ..models import ditvr

    def local(params, shard):
        return ditvr.apply(params, shard, heads=heads, time_axis=time_axis)

    return _make_exact_sharded(local, mesh, time_axis)


def make_exact_sharded_fmv(mesh: Mesh, scale: int = 4,
                           time_axis: str = "time"):
    """EXACT T-sharded FastMambaVSR inference: every temporal scan uses the
    distributed prefix-combine and the temporal convs exchange true frame
    halos — the sharded output equals the single-device output bit-for-bit
    (up to reduction order), unlike the halo-overlap approximation.

    Returns ``fn(params, clip)`` with clip (B, T, H, W, 3), T divisible by
    the time-axis size.
    """
    from ..models import fast_mamba_vsr as fmv

    clip_spec = P(None, time_axis, None, None, None)
    rep = P()

    def local(params, shard):
        return fmv.apply(params, shard, scale=scale, scan_impl="ref",
                         time_axis=time_axis)

    fn = shard_map(local, mesh=mesh, in_specs=(rep, clip_spec),
                   out_specs=clip_spec)
    run = jax.jit(fn)

    def wrapper(params, clip):
        n_t = mesh.shape[time_axis]
        if clip.shape[1] % n_t:
            raise ValueError(
                f"T={clip.shape[1]} not divisible by time axis {n_t}")
        params_r = jax.device_put(params, NamedSharding(mesh, rep))
        clip_s = jax.device_put(clip, NamedSharding(mesh, clip_spec))
        return run(params_r, clip_s)

    return wrapper


def make_mesh_sharded_clip_fn(apply_fn, mesh: Mesh, halo_t: int = 2,
                              halo_s: int = 8, scale: int = 1):
    """Fully mesh-sharded clip inference: B over ``data``, T over ``time``
    (frame halos), H over ``space`` (row halos) — whichever axes the mesh
    actually has (size-1 axes skip their halo exchange at trace time).

    ``apply_fn(params, clip)`` preserves T and scales H/W by ``scale``.
    """
    from .spatial import halo_exchange_space

    n_t = mesh.shape.get("time", 1)
    n_s = mesh.shape.get("space", 1)
    clip_spec = P("data", "time" if n_t > 1 else None,
                  "space" if n_s > 1 else None, None, None)
    rep = P()

    def local(params, shard):
        if n_t > 1:
            shard = halo_exchange_time(shard, halo_t, axis_name="time")
        if n_s > 1:
            shard = halo_exchange_space(shard, halo_s, axis_name="space")
        out = apply_fn(params, shard)
        if n_s > 1:
            tr = halo_s * scale
            out = out[:, :, tr:out.shape[2] - tr]
        if n_t > 1:
            out = out[:, halo_t:out.shape[1] - halo_t]
        return out

    # check_vma=False: the local fn may invoke Pallas kernels whose
    # out_shapes carry no varying-mesh-axes annotation.
    fn = shard_map(local, mesh=mesh, in_specs=(rep, clip_spec),
                   out_specs=clip_spec, check_vma=False)
    run = jax.jit(fn)

    def wrapper(params, clip):
        b, t, h = clip.shape[0], clip.shape[1], clip.shape[2]
        n_d = mesh.shape.get("data", 1)
        if b % n_d or t % n_t or h % n_s:
            raise ValueError(
                f"clip (B={b}, T={t}, H={h}) not divisible by mesh "
                f"(data={n_d}, time={n_t}, space={n_s})")
        if n_t > 1 and t // n_t < halo_t:
            raise ValueError(f"T shard {t // n_t} < halo {halo_t}")
        if n_s > 1 and h // n_s < halo_s:
            raise ValueError(f"H shard {h // n_s} < halo {halo_s}")
        params_r = jax.device_put(params, NamedSharding(mesh, rep))
        clip_s = jax.device_put(clip, NamedSharding(mesh, clip_spec))
        return run(params_r, clip_s)

    return wrapper


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
        check_vma=False,  # local fn may invoke Pallas kernels
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
