"""Process-level JAX setup: persistent compile cache + platform selection.

The TPU in this environment sits behind a tunnel whose compile service has
highly variable latency (observed 5 s to 300 s per program). The persistent
compilation cache makes repeated runs stable. Call ``setup()`` once at every
entry point (CLI, server, bench, graft entry) before building models.
"""

from __future__ import annotations

import os
import pathlib

_DONE = False


def setup(cache_dir: str | None = None, platform: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    platform = platform or os.environ.get("VETPU_PLATFORM")
    if platform:
        # NOTE: JAX_PLATFORMS cannot override the preset 'axon' value in this
        # environment; only this config update does.
        jax.config.update("jax_platforms", platform)
    cache = cache_dir or os.environ.get(
        "VETPU_JAX_CACHE", str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
    )
    try:
        pathlib.Path(cache).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    _DONE = True
