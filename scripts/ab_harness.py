"""Interleaved A/B timing harness for full-model impl comparisons.

Compiles each variant's timing chains ONCE, then alternates measurement
rounds A/B/A/B/... so tunnel drift hits both variants equally; reports
per-round slopes and the median. Resolves ~5 ms differences that the
one-shot scripts (ab_dwconv.py et al.) cannot.

Usage: python scripts/ab_harness.py fused_bissm|bissd_conv [rounds]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

from video_enhancer_tpu.utils.timing import chain_n, _median
from video_enhancer_tpu.nn import ssm as ssm_mod
from video_enhancer_tpu.models import fast_mamba_vsr as fmv
from video_enhancer_tpu.models import vsrm

N_SMALL, N_LARGE, REPS = 2, 6, 4


def bf16(p):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 and a.ndim >= 2 else a, p)


def slope_once(f_small, f_large, args):
    med = {}
    for n, f in ((N_SMALL, f_small), (N_LARGE, f_large)):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        med[n] = _median(ts)
    return (med[N_LARGE] - med[N_SMALL]) / (N_LARGE - N_SMALL)


def build(model, impl_kw):
    if model == "fmv":
        p, _ = fmv.init(jax.random.PRNGKey(0), dim=48, num_layers=8,
                        scale=4)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 180, 320, 3),
                               jnp.bfloat16)
        pb = bf16(p)
        fn = lambda xx: fmv.apply(pb, xx, scale=4)
    else:
        p, _ = vsrm.init(jax.random.PRNGKey(0), dim=64, num_blocks=6,
                         scale=4)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 7, 180, 320, 3),
                               jnp.bfloat16)
        pb = bf16(p)
        fn = lambda xx: vsrm.apply(pb, xx, scale=4)
    fs, fl = chain_n(fn, N_SMALL), chain_n(fn, N_LARGE)
    float(fs(x)), float(fl(x))  # compile + warm
    return fs, fl, (x,)


def main():
    exp = sys.argv[1] if len(sys.argv) > 1 else "fused_bissm"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    orig_bissm = ssm_mod.bissm_apply
    orig_bissd = vsrm.bissd_apply
    if exp == "fused_bissm":
        models = ["fmv", "vsrm"]
        variants = {
            "composed": lambda: setattr_all(
                functools.partial(orig_bissm, impl="composed")),
            "fused": lambda: setattr_all(
                functools.partial(orig_bissm, impl="fused")),
        }

        def setattr_all(f):
            fmv.bissm_apply = f
            vsrm.bissm_apply = f
    else:
        models = ["vsrm"]
        variants = {
            "grouped": lambda: setattr(
                vsrm, "bissd_apply",
                functools.partial(orig_bissd, conv_impl="grouped")),
            "pallas": lambda: setattr(
                vsrm, "bissd_apply",
                functools.partial(orig_bissd, conv_impl="pallas")),
        }

    for model in models:
        built = {}
        for name, activate in variants.items():
            activate()
            built[name] = build(model, None)
        results = {name: [] for name in variants}
        for r in range(rounds):
            for name in variants:
                fs, fl, args = built[name]
                s = slope_once(fs, fl, args)
                results[name].append(s)
                print(f"{model} {name} round{r}: {s*1e3:.1f} ms",
                      flush=True)
        for name, ss in results.items():
            print(f"{model} {name} MEDIAN: {_median(ss)*1e3:.1f} ms "
                  f"(n={len(ss)})", flush=True)


if __name__ == "__main__":
    main()
