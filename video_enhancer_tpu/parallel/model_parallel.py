"""Parameter sharding for models too large to replicate per chip.

The DiTVR 3b/7b presets (models/ditvr.py SIZE_PRESETS, mirroring reference
ditvr_handler.py:372-387) are 2.7-6.5 GB of parameters — replicating them
per device (the default everywhere else in this package) is impossible at
size. Here the weights are sharded FSDP-style over a mesh axis:

- every weight above ``min_bytes`` is split along its largest
  mesh-divisible dimension;
- initialization runs under jit with ``out_shardings``, so each shard is
  CREATED on its owner — no full replica ever materializes;
- the forward pass is jitted with the same shardings and XLA GSPMD inserts
  the all-gathers/reduce-scatters (scaling-book recipe: annotate shardings,
  let the compiler place collectives on ICI).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_fsdp_shardings", "init_sharded", "make_sharded_ditvr"]


def make_fsdp_shardings(shapes, mesh: Mesh, axis: str = "data",
                        min_bytes: int = 1 << 20):
    """Map a pytree of ShapeDtypeStructs (or arrays) to NamedShardings:
    weights >= min_bytes are sharded along their largest axis-divisible
    dimension; everything else is replicated."""
    n = mesh.shape[axis]

    def spec(a):
        shape = a.shape
        size_bytes = int(np.prod(shape)) * a.dtype.itemsize
        if len(shape) >= 2 and size_bytes >= min_bytes:
            for d in sorted(range(len(shape)), key=lambda d: -shape[d]):
                if shape[d] % n == 0:
                    return P(*[axis if i == d else None
                               for i in range(len(shape))])
        return P()

    return jax.tree.map(lambda a: NamedSharding(mesh, spec(a)), shapes)


def init_sharded(init_fn, key, mesh: Mesh, axis: str = "data",
                 min_bytes: int = 1 << 20, **init_kw):
    """Initialize ``init_fn(key, **kw) -> (params, meta)`` with large
    weights sharded over ``axis``. Returns (params, meta, shardings)."""
    meta_holder = {}

    def params_only(k):
        params, meta = init_fn(k, **init_kw)
        meta_holder["meta"] = meta
        return params

    shapes = jax.eval_shape(params_only, key)
    shardings = make_fsdp_shardings(shapes, mesh, axis=axis,
                                    min_bytes=min_bytes)
    with mesh:
        params = jax.jit(params_only, out_shardings=shardings)(key)
    return params, meta_holder["meta"], shardings


def make_sharded_ditvr(mesh: Mesh, preset: str = "3b", axis: str = "data",
                       heads: int | None = None, seed: int = 0,
                       min_bytes: int = 1 << 20):
    """DiTVR at a large size preset with FSDP-sharded parameters.

    Returns ``(params, fn)`` where ``fn(params, clip)`` runs the restoration
    forward with XLA-partitioned matmuls. Match: reference SEEDVR2_MODELS
    size table (ditvr_handler.py:372-387), which the reference can only
    instantiate replicated.
    """
    from ..models import ditvr

    cfg = ditvr.SIZE_PRESETS[preset]
    heads = heads or cfg["heads"]
    params, meta, shardings = init_sharded(
        ditvr.init, jax.random.PRNGKey(seed), mesh, axis=axis,
        min_bytes=min_bytes, dim=cfg["dim"], depth=cfg["depth"],
        heads=cfg["heads"],
    )

    @functools.partial(jax.jit, in_shardings=(shardings, None))
    def fn(p, clip):
        return ditvr.apply(p, clip, heads=heads)

    return params, fn
