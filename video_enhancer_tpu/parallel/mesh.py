"""Mesh construction and canonical shardings."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "clip_sharding", "frame_sharding", "replicated"]

AXES = ("data", "time", "space")


def make_mesh(data: int = 1, time: int = 1, space: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * time * space
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, time, space)
    return Mesh(arr, AXES)


def factor_devices(n: int) -> tuple[int, int, int]:
    """Split n devices over (data, time, space) as evenly as possible."""
    data = time = space = 1
    axis = 0
    while data * time * space < n:
        if axis % 3 == 0:
            data *= 2
        elif axis % 3 == 1:
            time *= 2
        else:
            space *= 2
        axis += 1
    assert data * time * space == n, f"n={n} must be a power of 2"
    return data, time, space


def clip_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, H, W, C) clips: B over data, T over time, H over space."""
    return NamedSharding(mesh, P("data", "time", "space", None, None))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) frame batches: B over data+time (fused), H over space."""
    return NamedSharding(mesh, P(("data", "time"), "space", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
