"""Device timing that survives a high-latency host<->TPU tunnel.

In this environment the TPU is reached through a tunnel whose host roundtrip
is ~2 s, so per-call wall timing (and even ``block_until_ready``) is
meaningless. ``device_time_per_call`` times K iterations chained *inside one
jitted computation* (data-dependent, so XLA cannot elide them) for two
different K and reports the slope — tunnel latency and dispatch overhead
cancel out.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["device_time_per_call", "chain_n"]


def chain_n(fn: Callable, n: int) -> Callable:
    """Build a jitted function running ``fn`` n times with data dependence.

    ``fn(*args) -> array``; iterations are chained by mixing a zero-scaled
    sample of the previous output into the first argument.
    """

    @jax.jit
    def run(*args):
        out = fn(*args)
        probe = (out.ravel()[0] * 0).astype(args[0].dtype)

        def body(_, carry):
            out = fn(args[0] + carry, *args[1:])
            return (out.ravel()[0] * 0).astype(args[0].dtype)

        last = jax.lax.fori_loop(0, n - 1, body, probe)
        return out.ravel()[0] + last

    return run


def _walltime(fn, *args) -> float:
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    # A tiny fetch guarantees full completion even if block_until_ready is
    # unreliable on the tunneled platform.
    t1 = time.perf_counter()
    return t1 - t0


def device_time_per_call(
    fn: Callable,
    *args,
    n_small: int = 5,
    n_large: int = 25,
    repeats: int = 2,
) -> float:
    """Seconds per call of ``fn(*args)`` on device, overhead-cancelled."""
    f_small = chain_n(fn, n_small)
    f_large = chain_n(fn, n_large)
    # Warm both compilations and the fetch path.
    float(f_small(*args))
    float(f_large(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f_small(*args))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f_large(*args))
        tl = time.perf_counter() - t0
        per = (tl - ts) / (n_large - n_small)
        if per > 0:
            best = min(best, per)
    return best
