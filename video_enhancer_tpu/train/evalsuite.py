"""Shared multi-seed quality evaluation for the bundled weights.

One implementation used by BOTH the CI quality gates
(tests/test_bundled_weights.py) and the cross-generator report
(scripts/crossgen_eval.py), over BOTH synthetic families:

- ``family="ind"``  — the training family (io/demo.py content degraded by
  train/data._degrade);
- ``family="alt"``  — the structurally disjoint family (train/evalgen.py).

Round-4 change: the widened randomized degradation pipeline (train/data.py)
made single-batch gains so noisy that one unlucky draw dominated the number
(measured: VSRM seed-999 batch +0.16 dB vs a +1.15 dB mean over 12 seeds).
Every gain here is therefore the MEAN over ``n_seeds`` independently drawn
batches — a stable statistic the gates can bind to.

Matches the reference's quality-gate intent (reference
config/policy_v1.yaml:236-251); the reference itself never measures its
models at all.
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np

__all__ = ["vsr_gain", "restore_gain", "interp_gain", "frames_for",
           "WEIGHTS_DIR"]

WEIGHTS_DIR = pathlib.Path(__file__).resolve().parents[1] / "weights"

_FRAME_CACHE: dict = {}


def frames_for(family: str, size: tuple[int, int] = (256, 256)):
    """Eval source frames for one family (cached per process)."""
    key = (family, size)
    if key not in _FRAME_CACHE:
        if family == "ind":
            from ..io.demo import make_demo_frames

            _FRAME_CACHE[key] = make_demo_frames(24, size)
        elif family == "alt":
            from .evalgen import make_alt_frames

            _FRAME_CACHE[key] = make_alt_frames(24, size, seed=0)
        else:
            raise ValueError(f"unknown eval family: {family}")
    return _FRAME_CACHE[key]


def _pairs(family: str, frames, batch, clip_len, crop, scale, seed):
    if family == "ind":
        from .data import make_pairs

        return make_pairs(frames, batch, clip_len, crop, scale, seed=seed)
    from .evalgen import make_alt_pairs

    return make_alt_pairs(frames, batch, clip_len, crop, scale, seed=seed)


def _triplets(family: str, frames, batch, crop, seed):
    if family == "ind":
        from .data import make_triplets

        return make_triplets(frames, batch, crop, seed=seed)
    from .evalgen import make_alt_triplets

    return make_alt_triplets(frames, batch, crop, seed=seed)


def vsr_gain(apply_fn, params, family: str, scale: int, *, crop: int = 128,
             batch: int = 2, clip_len: int = 4, n_seeds: int = 8,
             seed0: int = 999) -> float:
    """Mean PSNR gain (dB) of ``apply_fn(params, lr)`` over bicubic
    upsampling across ``n_seeds`` independently drawn batches."""
    import jax
    import jax.numpy as jnp

    from ..ops import resize
    from ..utils.metrics import psnr

    frames = frames_for(family)
    ap = jax.jit(apply_fn)
    gains = []
    for s in range(n_seeds):
        pr = _pairs(family, frames, batch, clip_len, crop, scale, seed0 + s)
        lr, hr = jnp.asarray(pr["lr"]), jnp.asarray(pr["hr"])
        out = ap(params, lr)
        base = jnp.clip(
            resize(lr, (hr.shape[2], hr.shape[3]), method="cubic"), 0, 1)
        gains.append(float(psnr(out, hr)) - float(psnr(base, hr)))
    return float(np.mean(gains))


def restore_gain(apply_fn, params, family: str, *, crop: int = 64,
                 batch: int = 2, clip_len: int = 4, n_seeds: int = 8,
                 seed0: int = 999) -> float:
    """Mean PSNR gain (dB) of a 1x restoration model over the degraded
    input itself."""
    import jax
    import jax.numpy as jnp

    from ..utils.metrics import psnr

    frames = frames_for(family)
    ap = jax.jit(apply_fn)
    gains = []
    for s in range(n_seeds):
        pr = _pairs(family, frames, batch, clip_len, crop, 1, seed0 + s)
        deg, clean = jnp.asarray(pr["lr"]), jnp.asarray(pr["hr"])
        out = ap(params, deg)
        gains.append(float(psnr(out, clean)) - float(psnr(deg, clean)))
    return float(np.mean(gains))


def interp_gain(interp_fn, params, family: str, *, crop: int = 128,
                batch: int = 4, n_seeds: int = 8,
                seed0: int = 999) -> float:
    """Mean PSNR gain (dB) of frame interpolation over the average-blend
    baseline on true-middle-frame triplets."""
    import jax
    import jax.numpy as jnp

    from ..utils.metrics import psnr

    frames = frames_for(family)
    ap = jax.jit(interp_fn)
    gains = []
    for s in range(n_seeds):
        tri = _triplets(family, frames, batch, crop, seed0 + s)
        f0 = jnp.asarray(tri["lr"][:, 0])
        f1 = jnp.asarray(tri["lr"][:, 1])
        mid = jnp.asarray(tri["hr"][:, 0])
        out = ap(params, f0, f1)
        gains.append(float(psnr(out, mid))
                     - float(psnr((f0 + f1) / 2, mid)))
    return float(np.mean(gains))


@functools.lru_cache(maxsize=None)
def model_entry(name: str):
    """(init_fn, apply_fn, npz_path, kind) per bundled model; the single
    place eval configs live so the gates and the report can't drift.

    ``apply_fn`` includes the model's calibrated output strength
    (runtime/calibration.py) exactly as the serving handlers apply it, so
    every gain measured here is the gain a served video gets. The
    strength-sweep scripts pin ``VETPU_STRENGTH_<NAME>=1.0`` to measure
    the raw model instead."""
    init_fn, apply_fn, npz, kind = _raw_model_entry(name)
    if name != "seedvr2":  # seedvr2's strength lives inside its apply
        from ..runtime import calibration as cal

        if kind in ("vsr4", "vsr2"):
            apply_fn = cal.calibrate_vsr(name, apply_fn)
        elif kind == "restore":
            apply_fn = cal.calibrate_restore(name, apply_fn)
        else:
            apply_fn = cal.calibrate_interp(name, apply_fn)
    return init_fn, apply_fn, npz, kind


def _raw_model_entry(name: str):
    import jax

    if name == "vsrm":
        from ..models import vsrm as m

        return (lambda: m.init(jax.random.PRNGKey(0), dim=64, num_blocks=6,
                               scale=4)[0],
                lambda p, x: m.apply(p, x, scale=4, scan_impl="ref"),
                WEIGHTS_DIR / "vsrm_4x.npz", "vsr4")
    if name == "fast_mamba_vsr":
        from ..models import fast_mamba_vsr as m

        return (lambda: m.init(jax.random.PRNGKey(0), dim=48, num_layers=8,
                               scale=4)[0],
                lambda p, x: m.apply(p, x, scale=4),
                WEIGHTS_DIR / "fast_mamba_vsr_4x.npz", "vsr4")
    if name == "fast_mamba_vsr_ssd":
        from ..models import fast_mamba_vsr as m

        return (lambda: m.init(jax.random.PRNGKey(0), dim=48, num_layers=8,
                               scale=4, temporal_mixer="ssd")[0],
                lambda p, x: m.apply(p, x, scale=4),
                WEIGHTS_DIR / "fast_mamba_vsr_ssd_4x.npz", "vsr4")
    if name == "realesrgan_fast":
        from ..models import realesrgan as m

        def apply_clip_fast(p, clip):
            b, t = clip.shape[0], clip.shape[1]
            fr = clip.reshape((b * t,) + clip.shape[2:])
            out = m.apply(p, fr, scale=4)
            return out.reshape((b, t) + out.shape[1:])

        return (lambda: m.init(jax.random.PRNGKey(0), features=64,
                               num_blocks=3)[0],
                apply_clip_fast, WEIGHTS_DIR / "realesrgan_fast_4x.npz",
                "vsr4")
    if name == "rvrt":
        from ..models import rvrt as m

        return (lambda: m.init(jax.random.PRNGKey(0), dim=64, scale=4)[0],
                lambda p, x: m.apply(p, x, scale=4),
                WEIGHTS_DIR / "rvrt_4x.npz", "vsr4")
    if name == "realesrgan":
        from ..models import realesrgan as m

        def apply_clip(p, clip):
            b, t = clip.shape[0], clip.shape[1]
            fr = clip.reshape((b * t,) + clip.shape[2:])
            out = m.apply(p, fr, scale=4)
            return out.reshape((b, t) + out.shape[1:])

        return (lambda: m.init(jax.random.PRNGKey(0), features=64,
                               num_blocks=6)[0],
                apply_clip, WEIGHTS_DIR / "realesrgan_4x.npz", "vsr4")
    if name == "cnn_upscaler":
        from ..models import upscaler as m

        def apply_clip(p, clip):
            b, t = clip.shape[0], clip.shape[1]
            fr = clip.reshape((-1,) + clip.shape[2:])
            out = m.apply(p, fr, scale=2, s2d=4)
            return out.reshape((b, t) + out.shape[1:])

        return (lambda: m.init(jax.random.PRNGKey(0), features=128, scale=2,
                               s2d=4)[0],
                apply_clip, WEIGHTS_DIR / "cnn_upscaler_2x.npz", "vsr2")
    if name == "ditvr":
        from ..models import ditvr as m

        return (lambda: m.init(jax.random.PRNGKey(0), heads=3)[0],
                lambda p, x: m.apply(p, x, heads=3),
                WEIGHTS_DIR / "ditvr_1x.npz", "restore")
    if name == "seedvr2":
        from ..models import seedvr2 as m

        return (lambda: m.init(jax.random.PRNGKey(0))[0],
                lambda p, x: m.apply(p, x),
                WEIGHTS_DIR / "seedvr2_1x.npz", "restore")
    if name == "rife":
        from ..models import rife as m

        return (lambda: m.init(jax.random.PRNGKey(0))[0],
                m.interpolate_pair, WEIGHTS_DIR / "rife.npz", "interp")
    raise ValueError(f"unknown model: {name}")


def bundled_gain(name: str, family: str, n_seeds: int = 8) -> float:
    """Load the bundled npz for ``name`` and return its mean gain on one
    eval family. Raises FileNotFoundError when the npz is not bundled."""
    from ..runtime.weights import try_load_params

    init_fn, apply_fn, npz, kind = model_entry(name)
    if not npz.exists():
        raise FileNotFoundError(npz)
    params = try_load_params(npz, init_fn())
    assert params is not None, f"bundled weights failed to load: {npz}"
    if kind == "vsr4":
        return vsr_gain(apply_fn, params, family, 4, n_seeds=n_seeds)
    if kind == "vsr2":
        return vsr_gain(apply_fn, params, family, 2, n_seeds=n_seeds)
    if kind == "restore":
        return restore_gain(apply_fn, params, family, n_seeds=n_seeds)
    return interp_gain(apply_fn, params, family, n_seeds=n_seeds)


def gain_for_npz(name: str, npz_path, family: str,
                 n_seeds: int = 6) -> float:
    """bundled_gain, but for an arbitrary weights file (same architecture
    entry as ``name``)."""
    import pathlib as _pl

    from ..runtime.weights import try_load_params

    init_fn, apply_fn, _, kind = model_entry(name)
    params = try_load_params(_pl.Path(npz_path), init_fn())
    assert params is not None, f"weights failed to load: {npz_path}"
    if kind == "vsr4":
        return vsr_gain(apply_fn, params, family, 4, n_seeds=n_seeds)
    if kind == "vsr2":
        return vsr_gain(apply_fn, params, family, 2, n_seeds=n_seeds)
    if kind == "restore":
        return restore_gain(apply_fn, params, family, n_seeds=n_seeds)
    return interp_gain(apply_fn, params, family, n_seeds=n_seeds)


ALL_MODELS = ("vsrm", "fast_mamba_vsr", "fast_mamba_vsr_ssd", "rvrt",
              "realesrgan", "realesrgan_fast", "cnn_upscaler", "ditvr",
              "seedvr2", "rife")


def write_qualification_report(path=None, n_seeds: int = 6,
                               models=ALL_MODELS) -> dict:
    """Measure every bundled model on both eval families and write the
    machine-readable qualification report the serving path consults
    (runtime/qualification.py): model -> {ind, alt} mean gain in dB.
    Models without bundled weights are skipped (absent from the report =
    not demoted)."""
    import json

    from ..runtime.qualification import report_path

    out = {}
    for name in models:
        entry = {}
        for family in ("ind", "alt"):
            try:
                entry[family] = round(
                    bundled_gain(name, family, n_seeds=n_seeds), 3)
            except FileNotFoundError:
                break
        if entry:
            out[name] = entry
    report = {"n_seeds": n_seeds,
              "gain_unit": "dB PSNR vs non-ML fallback, mean over seeds",
              "models": out}
    dest = pathlib.Path(path) if path else report_path()
    dest.write_text(json.dumps(report, indent=1, sort_keys=True) + "\n")
    return report


def _main(argv=None):
    """Retrain eval gate (round 4): measured twice this round, a warm
    retrain whose TRAIN loss looked fine shipped an eval REGRESSION
    (cnn_upscaler +0.087 -> +0.071 at lr 1.5e-4; rife +1.93 -> -1.26 on a
    flat-plateau run). ``--compare-npz`` measures the bundled weights
    against a pre-train snapshot and exits 1 when the new export is worse,
    so scripts/retrain_all.sh can auto-revert instead of silently shipping
    the regression."""
    import argparse
    import json

    # Honor VETPU_PLATFORM (the retrain scripts set cpu so gated evals
    # never claim — or wait on — the TPU; without this call the preset
    # axon backend wins and every eval pays ~2 s tunnel roundtrips AND
    # serializes with training).
    from ..utils.jaxenv import setup

    setup()

    p = argparse.ArgumentParser()
    p.add_argument("model", nargs="?", default=None)
    p.add_argument("--family", default="ind", choices=["ind", "alt"])
    p.add_argument("--n-seeds", type=int, default=6)
    p.add_argument("--compare-npz", default=None,
                   help="pre-train snapshot; exit 1 if bundled < snapshot")
    p.add_argument("--report", action="store_true",
                   help="measure ALL bundled models on both families and "
                        "write weights/QUALIFICATION.json (the serving "
                        "path's auto-routability input)")
    args = p.parse_args(argv)

    if args.report:
        rep = write_qualification_report(n_seeds=args.n_seeds)
        print(json.dumps(rep))
        return 0
    if args.model is None:
        p.error("model is required unless --report is given")

    cur = bundled_gain(args.model, args.family, n_seeds=args.n_seeds)
    out = {"model": args.model, "family": args.family,
           "gain_db": round(cur, 3)}
    rc = 0
    if args.compare_npz:
        prev = gain_for_npz(args.model, args.compare_npz, args.family,
                            n_seeds=args.n_seeds)
        out["snapshot_gain_db"] = round(prev, 3)
        rc = 1 if cur < prev else 0
        out["verdict"] = "regression" if rc else "ok"
    print(json.dumps(out))
    return rc


if __name__ == "__main__":
    import sys as _sys

    _sys.exit(_main())
