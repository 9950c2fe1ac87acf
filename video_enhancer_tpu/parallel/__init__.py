"""SPMD parallelism: named meshes, shardings, collectives, halo exchange.

The reference is single-process single-GPU; its batching/windowing/tiling
trio (SURVEY.md §2.7) maps here to mesh axes:

  ``data``   frame-batch / clip data parallelism
  ``time``   temporal context parallelism (halo or state-carry exchange)
  ``space``  spatial sharding of H for 4K+ frames (halo exchange)
"""

from .mesh import (  # noqa: F401
    make_mesh,
    clip_sharding,
    frame_sharding,
    replicated,
)
