"""Per-model calibrated output strength (restoration-strength control).

``out = s * model(x) + (1 - s) * fallback(x)`` where ``fallback`` is the
model's non-ML baseline (bicubic upscale for VSR, the input itself for 1x
restoration, the average blend for interpolation). The reference hardcodes
full strength everywhere and never measures it (reference
seedvr2_handler.py:104-131, vsrm_handler.py:470-476); here each model's
``s`` is CALIBRATED on the measured two-family eval
(scripts/vsr_strength_sweep.py, scripts/restore_strength_sweep.py,
scripts/interp_strength_sweep.py — 6-seed means, recorded in
BENCH_RESULTS.md round-5 log) and applied identically on the serving path
(runtime/registry.py handlers) and the quality gates
(train/evalsuite.model_entry), so CI measures exactly what serving runs.

Why shrinkage helps: every bundled model's raw correction carries an
in-distribution component (helpful on both families) plus a
training-family-specific component (harmful cross-generator). Scaling the
correction toward the fallback attenuates the second faster than the
first, so a calibrated ``s < 1`` flips the measured cross-generator (alt)
gain positive for part of the zoo (fast_mamba_vsr, vsrm, rvrt) and bounds
the harm for the rest — the zero-training half of closing the round-4
generalization gap.

seedvr2 is intentionally ABSENT from the table: its strength lives inside
``models/seedvr2.apply`` (DEFAULT_STRENGTH / VETPU_SEEDVR2_STRENGTH) so
training optimizes the blended objective; wrapping it here would blend
twice.

Env override per model: ``VETPU_STRENGTH_<NAME>`` (upper-cased model
name), read at wrap time (handler build / first model_entry call).
"""

from __future__ import annotations

import os

__all__ = ["CALIBRATED_STRENGTH", "strength_for", "calibrate_vsr",
           "calibrate_restore", "calibrate_interp"]

# Measured operating points (see module docstring; full sweep tables in
# BENCH_RESULTS.md round-5 log). 1.0 = identity (no wrapper inserted).
# Selection rule per model: where the alt(s) curve crosses zero at usable
# in-distribution gain, the largest s with a positive alt margin
# (generalization-first — these models' alt gates assert positive
# cross-generator transfer); otherwise the measured knee of the tradeoff
# curve (for rife and ditvr the knee even IMPROVES ind vs full strength:
# rife 1.926 -> 2.035 dB at s=0.9, ditvr 1.482 -> 1.662 at s=0.7 — the
# raw correction overshoots on its own training family too).
#
# 6-seed measured (ind, alt) dB at the shipped s:
#   fast_mamba_vsr   0.6  -> (+0.436, +0.035)   [raw: +0.531, -0.031]
#   vsrm             0.25 -> (+0.438, +0.008)   [raw: +0.841, -0.273]
#   rvrt             0.25 -> (+0.325, +0.007)   [raw: +0.638, -0.397]
#   realesrgan_fast  0.2  -> (+0.393, +0.010)   [raw: +1.159, -0.539]
#   realesrgan       0.4  -> (+0.743, -0.067)   [raw: +1.053, -0.674]
#   rife             0.9  -> (+2.035, -0.306)   [raw: +1.926, -0.376]
#   ditvr            0.5  -> (+1.413, -1.169)   [raw: +1.482, -3.060]
#   cnn_upscaler     0.7  -> (+0.099, -0.082)   [raw: +0.100, -0.129]
# fast_mamba_vsr_ssd stays at 1.0 (already positive on both families);
# seedvr2's 0.2 lives in models/seedvr2.py.
CALIBRATED_STRENGTH: dict[str, float] = {
    "fast_mamba_vsr": 0.6,
    "vsrm": 0.25,
    "rvrt": 0.25,
    "realesrgan_fast": 0.2,
    "realesrgan": 0.4,
    "rife": 0.9,
    "ditvr": 0.5,
    "cnn_upscaler": 0.7,
}


def strength_for(name: str) -> float:
    env = os.environ.get(f"VETPU_STRENGTH_{name.upper()}")
    if env is not None:
        return float(env)
    return CALIBRATED_STRENGTH.get(name, 1.0)


def calibrate_vsr(name: str, apply_fn):
    """Wrap a clip-level VSR apply ``(params, clip) -> upscaled clip`` with
    the calibrated blend toward the bicubic baseline. Identity when s=1."""
    s = strength_for(name)
    if s >= 1.0:
        return apply_fn
    import jax.numpy as jnp

    from ..ops import resize

    def fn(p, x, *a, **kw):
        out = apply_fn(p, x, *a, **kw)
        # (..., H, W, C): works for frame (B,H,W,C) and clip (B,T,H,W,C)
        # applies alike.
        base = resize(x, (out.shape[-3], out.shape[-2]), method="cubic")
        base = jnp.clip(base, 0.0, 1.0).astype(out.dtype)
        return jnp.clip(s * out + (1.0 - s) * base, 0.0, 1.0)

    return fn


def calibrate_restore(name: str, apply_fn):
    """Wrap a 1x restoration apply with the calibrated blend toward the
    input itself."""
    s = strength_for(name)
    if s >= 1.0:
        return apply_fn
    import jax.numpy as jnp

    def fn(p, x, *a, **kw):
        out = apply_fn(p, x, *a, **kw)
        return jnp.clip(s * out + (1.0 - s) * x.astype(out.dtype), 0.0, 1.0)

    return fn


def calibrate_interp(name: str, interp_fn):
    """Wrap a pair interpolation ``(params, f0, f1) -> mid`` with the
    calibrated blend toward the average-blend baseline."""
    s = strength_for(name)
    if s >= 1.0:
        return interp_fn
    import jax.numpy as jnp

    def fn(p, f0, f1, *a, **kw):
        out = interp_fn(p, f0, f1, *a, **kw)
        base = ((f0 + f1) / 2).astype(out.dtype)
        return jnp.clip(s * out + (1.0 - s) * base, 0.0, 1.0)

    return fn
