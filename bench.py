#!/usr/bin/env python
"""Benchmark: CNN-2x upscale throughput, 720p -> 1440p, frames/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

Baseline (BASELINE.md): the reference's ZeroGPU path estimates ~0.5 s/frame
(~2 fps) on an H200 slice (reference app.py:402-403); our north-star target is
>=200 frames/sec/chip on this path (BASELINE.json).

Device timing uses the two-N slope method (utils/timing.py) because the TPU
tunnel in this environment adds ~2 s of host roundtrip per fetch, which would
otherwise swamp the measurement.
"""

import json
import sys

sys.path.insert(0, ".")

from video_enhancer_tpu.utils.jaxenv import setup

setup()

import jax
import jax.numpy as jnp

from video_enhancer_tpu.models import upscaler
from video_enhancer_tpu.utils.timing import device_time_per_call

BASELINE_FPS = 2.0  # reference: ~0.5 s/frame on ZeroGPU H200 (app.py:402-403)


def bench_cnn():
    batch, h, w = 8, 720, 1280
    params, _ = upscaler.init(jax.random.PRNGKey(0), features=128, scale=2,
                              s2d=4)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def fwd(x):
        return upscaler.apply(params, x.astype(jnp.bfloat16), scale=2,
                              s2d=4).astype(jnp.float32)

    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, h, w, 3),
                           jnp.float32)
    sec = device_time_per_call(fwd, x, n_small=4, n_large=16)
    return {
        "metric": "cnn_upscaler_720p_to_1440p_throughput",
        "value": round(batch / sec, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(batch / sec / BASELINE_FPS, 2),
        "detail": {
            "batch": batch,
            "ms_per_batch": round(sec * 1e3, 3),
            "backend": jax.default_backend(),
            "baseline_fps": BASELINE_FPS,
        },
    }


def bench_fast_mamba():
    from video_enhancer_tpu.models import fast_mamba_vsr as fmv

    t, h, w = 8, 180, 320
    params, _ = fmv.init(jax.random.PRNGKey(0), dim=48, num_layers=8,
                         scale=4)
    pb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, t, h, w, 3),
                           jnp.bfloat16)
    sec = device_time_per_call(lambda xx: fmv.apply(pb, xx, scale=4), x,
                               n_small=2, n_large=6)
    # Reference API estimate: fast_mamba 60 s per minute of 24fps video
    # => ~24 fps (process_endpoints.py:724-729).
    base = 24.0
    return {
        "metric": "fast_mamba_vsr_180p_x4_throughput",
        "value": round(t / sec, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(t / sec / base, 2),
        "detail": {"clip": [t, h, w], "ms_per_clip": round(sec * 1e3, 1),
                   "backend": jax.default_backend(), "baseline_fps": base},
    }


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="cnn_upscaler",
                   choices=["cnn_upscaler", "fast_mamba_vsr"])
    args = p.parse_args()
    result = (bench_cnn() if args.model == "cnn_upscaler"
              else bench_fast_mamba())
    print(json.dumps(result))


if __name__ == "__main__":
    main()
