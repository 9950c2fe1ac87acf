#!/usr/bin/env python
"""Measure every bundled model's held-out gain on BOTH synthetic families:
in-distribution (io/demo.py + train/data._degrade — the training family)
and cross-generator (train/evalgen.py — structurally disjoint textures,
motion, and degradations). Prints one JSON line per model. Used to set the
cross-generator quality gates in tests/test_bundled_weights.py (round-4
verdict item 3)."""

import json
import pathlib
import sys

sys.path.insert(0, ".")

from video_enhancer_tpu.utils.jaxenv import setup

setup()

import jax
import jax.numpy as jnp

from video_enhancer_tpu.io.demo import make_demo_frames
from video_enhancer_tpu.ops import resize
from video_enhancer_tpu.runtime.weights import try_load_params
from video_enhancer_tpu.train.data import make_pairs, make_triplets
from video_enhancer_tpu.train.evalgen import (make_alt_frames,
                                              make_alt_pairs,
                                              make_alt_triplets)
from video_enhancer_tpu.utils.metrics import psnr

WEIGHTS = pathlib.Path(__file__).resolve().parents[1] / \
    "video_enhancer_tpu/weights"


def vsr_gain(init_fn, apply_fn, npz, pairs):
    params, *_ = init_fn(jax.random.PRNGKey(0))
    loaded = try_load_params(npz, params)
    assert loaded is not None, npz
    lr, hr = jnp.asarray(pairs["lr"]), jnp.asarray(pairs["hr"])
    out = apply_fn(loaded, lr)
    base = jnp.clip(resize(lr, (hr.shape[2], hr.shape[3]), method="cubic"),
                    0, 1)
    return float(psnr(out, hr)) - float(psnr(base, hr))


def main():
    demo = make_demo_frames(24, (256, 256))
    alt = make_alt_frames(24, (256, 256), seed=0)

    def both_pairs(scale, crop=128, batch=2, clip=4):
        return (make_pairs(demo, batch, clip, crop, scale, seed=999),
                make_alt_pairs(alt, batch, clip, crop, scale, seed=999))

    results = {}

    from video_enhancer_tpu.models import fast_mamba_vsr as fmv
    from video_enhancer_tpu.models import (ditvr, realesrgan, rvrt, seedvr2,
                                           upscaler, vsrm)

    ind, alt_p = both_pairs(4)
    results["vsrm"] = [
        vsr_gain(lambda k: vsrm.init(k, dim=64, num_blocks=6, scale=4),
                 lambda p, x: vsrm.apply(p, x, scale=4, scan_impl="ref"),
                 WEIGHTS / "vsrm_4x.npz", pr)
        for pr in (ind, alt_p)]
    print(json.dumps({"model": "vsrm", "ind_db": results["vsrm"][0],
                      "alt_db": results["vsrm"][1]}), flush=True)

    def re_apply(p, clip):
        b, t = clip.shape[0], clip.shape[1]
        fr = clip.reshape((b * t,) + clip.shape[2:])
        out = realesrgan.apply(p, fr, scale=4)
        return out.reshape((b, t) + out.shape[1:])

    results["realesrgan"] = [
        vsr_gain(lambda k: realesrgan.init(k, features=64, num_blocks=6),
                 re_apply, WEIGHTS / "realesrgan_4x.npz", pr)
        for pr in (ind, alt_p)]
    print(json.dumps({"model": "realesrgan",
                      "ind_db": results["realesrgan"][0],
                      "alt_db": results["realesrgan"][1]}), flush=True)

    results["rvrt"] = [
        vsr_gain(lambda k: rvrt.init(k, dim=64, scale=4),
                 lambda p, x: rvrt.apply(p, x, scale=4),
                 WEIGHTS / "rvrt_4x.npz", pr)
        for pr in (ind, alt_p)]
    print(json.dumps({"model": "rvrt", "ind_db": results["rvrt"][0],
                      "alt_db": results["rvrt"][1]}), flush=True)

    results["fast_mamba_vsr"] = [
        vsr_gain(lambda k: fmv.init(k, dim=48, num_layers=8, scale=4),
                 lambda p, x: fmv.apply(p, x, scale=4),
                 WEIGHTS / "fast_mamba_vsr_4x.npz", pr)
        for pr in (ind, alt_p)]
    print(json.dumps({"model": "fast_mamba_vsr",
                      "ind_db": results["fast_mamba_vsr"][0],
                      "alt_db": results["fast_mamba_vsr"][1]}), flush=True)

    ind1, alt1 = (make_pairs(demo, 2, 4, 64, 1, seed=999),
                  make_alt_pairs(alt, 2, 4, 64, 1, seed=999))
    for name, mod, kw in (("ditvr", ditvr, {"heads": 3}),
                          ("seedvr2", seedvr2, {})):
        params, *_ = mod.init(jax.random.PRNGKey(0), **kw)
        loaded = try_load_params(WEIGHTS / f"{name}_1x.npz", params)
        pair_gains = []
        for pr in (ind1, alt1):
            deg, clean = jnp.asarray(pr["lr"]), jnp.asarray(pr["hr"])
            out = mod.apply(loaded, deg, **kw)
            pair_gains.append(float(psnr(out, clean))
                              - float(psnr(deg, clean)))
        results[name] = pair_gains
        print(json.dumps({"model": name, "ind_db": pair_gains[0],
                          "alt_db": pair_gains[1]}), flush=True)

    from video_enhancer_tpu.models import rife

    params, *_ = rife.init(jax.random.PRNGKey(0))
    loaded = try_load_params(WEIGHTS / "rife.npz", params)
    rg = []
    for tri in (make_triplets(demo, 4, 128, seed=999),
                make_alt_triplets(alt, 4, 128, seed=999)):
        f0 = jnp.asarray(tri["lr"][:, 0])
        f1 = jnp.asarray(tri["lr"][:, 1])
        mid = jnp.asarray(tri["hr"][:, 0])
        out = rife.interpolate_pair(loaded, f0, f1)
        rg.append(float(psnr(out, mid)) - float(psnr((f0 + f1) / 2, mid)))
    results["rife"] = rg
    print(json.dumps({"model": "rife", "ind_db": rg[0], "alt_db": rg[1]}),
          flush=True)

    ind2, alt2 = (make_pairs(demo, 2, 4, 128, 2, seed=999),
                  make_alt_pairs(alt, 2, 4, 128, 2, seed=999))
    cg = []
    params, *_ = upscaler.init(jax.random.PRNGKey(0), features=128, scale=2,
                               s2d=4)
    loaded = try_load_params(WEIGHTS / "cnn_upscaler_2x.npz", params)
    for pr in (ind2, alt2):
        lr, hr = jnp.asarray(pr["lr"]), jnp.asarray(pr["hr"])
        fr = lr.reshape((-1,) + lr.shape[2:])
        out = upscaler.apply(loaded, fr, scale=2, s2d=4).reshape(
            (lr.shape[0], lr.shape[1], hr.shape[2], hr.shape[3], 3))
        base = jnp.clip(resize(lr, (hr.shape[2], hr.shape[3]),
                               method="cubic"), 0, 1)
        cg.append(float(psnr(out, hr)) - float(psnr(base, hr)))
    results["cnn_upscaler"] = cg
    print(json.dumps({"model": "cnn_upscaler", "ind_db": cg[0],
                      "alt_db": cg[1]}), flush=True)


if __name__ == "__main__":
    main()
