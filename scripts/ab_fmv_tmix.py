"""Interleaved A/B: FMV temporal mixer ssm (Mamba-1 scan kernel) vs ssd
(dense masked-decay mixing), random weights — throughput only."""
import sys
import time

import jax
import jax.numpy as jnp

from video_enhancer_tpu.utils.timing import chain_n, _median
from video_enhancer_tpu.models import fast_mamba_vsr as fmv

N_SMALL, N_LARGE, REPS = 2, 6, 4
rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6


def bf16(p):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 and a.ndim >= 2 else a, p)


def build(mixer):
    p, _ = fmv.init(jax.random.PRNGKey(0), dim=48, num_layers=8, scale=4,
                    temporal_mixer=mixer)
    pb = bf16(p)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 180, 320, 3),
                           jnp.bfloat16)
    fn = lambda xx: fmv.apply(pb, xx, scale=4)
    fs, fl = chain_n(fn, N_SMALL), chain_n(fn, N_LARGE)
    float(fs(x)), float(fl(x))
    return fs, fl, (x,)


def slope_once(fs, fl, args):
    med = {}
    for n, f in ((N_SMALL, fs), (N_LARGE, fl)):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        med[n] = _median(ts)
    return (med[N_LARGE] - med[N_SMALL]) / (N_LARGE - N_SMALL)


built = {m: build(m) for m in ("ssm", "ssd")}
res = {m: [] for m in built}
for r in range(rounds):
    for m, (fs, fl, args) in built.items():
        s = slope_once(fs, fl, args)
        res[m].append(s)
        print(f"fmv tmix={m} round{r}: {s*1e3:.1f} ms", flush=True)
for m, ss in res.items():
    print(f"fmv tmix={m} MEDIAN: {_median(ss)*1e3:.1f} ms", flush=True)
