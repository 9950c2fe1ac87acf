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


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])


def device_time_per_call(
    fn: Callable,
    *args,
    n_small: int = 5,
    n_large: int = 25,
    repeats: int = 4,
    max_flops: float | None = None,
) -> float:
    """Seconds per call of ``fn(*args)`` on device, overhead-cancelled.

    Robust estimator (round-3 hardening; the round-2 ``min`` over 2 repeats
    once produced a 609%-of-peak artifact when one tunnel hiccup inflated
    the small-N run):

    - three chain lengths (small / mid / large), ``repeats`` timings each,
      per-N **median** — a single latency spike cannot set the result;
    - slope from the median times with a monotonicity check (medians must
      increase with N) and a cross-check between the (small,large) and
      (mid,large) slopes — on disagreement >2x the whole round is re-run
      once with doubled repeats;
    - optional ``max_flops``: a physical ceiling (analytic FLOPs / peak);
      an implied time below it is impossible and triggers the same retry,
      after which the estimate is clamped to the ceiling rather than
      published as >100% of peak.
    """
    n_mid = (n_small + n_large) // 2
    fns = [(n, chain_n(fn, n)) for n in (n_small, n_mid, n_large)]
    # Warm every compilation and the fetch path.
    for _, f in fns:
        float(f(*args))

    def one_round(reps: int) -> float | None:
        med = {}
        for n, f in fns:
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f(*args))
                ts.append(time.perf_counter() - t0)
            med[n] = _median(ts)
        # Monotonicity: medians must increase with chain length.
        if not (med[n_small] < med[n_mid] < med[n_large]):
            return None
        slope_sl = (med[n_large] - med[n_small]) / (n_large - n_small)
        slope_ml = (med[n_large] - med[n_mid]) / (n_large - n_mid)
        if slope_sl <= 0 or slope_ml <= 0:
            return None
        # Cross-check the two independent slopes.
        if max(slope_sl, slope_ml) > 2.0 * min(slope_sl, slope_ml):
            return None
        per = 0.5 * (slope_sl + slope_ml)
        if max_flops is not None and per * _PEAK_FLOPS < max_flops:
            return None  # implies >100% of peak: physically impossible
        return per

    est = one_round(repeats)
    if est is None:
        est = one_round(2 * repeats)
    if est is None:
        # Fall back to the most conservative defensible number: the
        # (mid,large) slope of a final round, floored at the physical limit.
        med = {}
        for n, f in fns[1:]:
            ts = []
            for _ in range(2 * repeats):
                t0 = time.perf_counter()
                float(f(*args))
                ts.append(time.perf_counter() - t0)
            med[n] = _median(ts)
        est = max((med[n_large] - med[n_mid]) / (n_large - n_mid), 1e-9)
        if max_flops is not None:
            est = max(est, max_flops / _PEAK_FLOPS)
    return est


_PEAK_FLOPS = 197e12  # v5e bf16 peak; ceiling used for impossibility checks
