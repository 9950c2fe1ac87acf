"""Interleaved A/B: rvrt windowed attention — XLA reference path vs the
fused window_attention Pallas kernel (round-5 lever). Random weights,
throughput only; exactness is asserted first at the serving shape."""
import os
import sys
import time

sys.path.insert(0, ".")

from video_enhancer_tpu.utils.jaxenv import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from video_enhancer_tpu.utils.timing import _median, chain_n  # noqa: E402

N_SMALL, N_LARGE, REPS = 2, 6, 4
rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def bf16(p):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 and a.ndim >= 2 else a, p)


def build(impl):
    os.environ["VETPU_RVRT_ATTN"] = impl
    import importlib

    from video_enhancer_tpu.models import rvrt
    importlib.reload(rvrt)  # env read inside _swin_block per call: no-op,
    # but reload keeps any module-level caching honest.
    p, _ = rvrt.init(jax.random.PRNGKey(0), scale=4)
    pb = bf16(p)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 180, 320, 3),
                           jnp.bfloat16)
    fn = lambda xx: rvrt.apply(pb, xx, scale=4)  # noqa: E731
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


# Exactness at the serving shape first (fp32, tiny batch).
os.environ["VETPU_RVRT_ATTN"] = "kernel"
from video_enhancer_tpu.models import rvrt  # noqa: E402

p32, _ = rvrt.init(jax.random.PRNGKey(0), dim=32, depth=2, scale=4)
x32 = jax.random.uniform(jax.random.PRNGKey(2), (1, 4, 64, 64, 3),
                         jnp.float32)
y_kernel = rvrt.apply(p32, x32, scale=4)
os.environ["VETPU_RVRT_ATTN"] = "ref"
y_ref = rvrt.apply(p32, x32, scale=4)
print(f"rvrt kernel-vs-ref max|Δ| = "
      f"{float(jnp.max(jnp.abs(y_kernel - y_ref))):.2e}", flush=True)

built = {m: build(m) for m in ("ref", "kernel")}
res = {m: [] for m in built}
for r in range(rounds):
    for m, (fs, fl, args) in built.items():
        os.environ["VETPU_RVRT_ATTN"] = m
        s = slope_once(fs, fl, args)
        res[m].append(s)
        print(f"rvrt attn={m} round{r}: {s * 1e3:.1f} ms", flush=True)
for m, ss in res.items():
    print(f"rvrt attn={m} MEDIAN: {_median(ss) * 1e3:.1f} ms", flush=True)
