"""Bundled-weight quality gates: every shipped npz must beat its non-ML
fallback on held-out synthetic pairs from BOTH eval families (match: the
reference's weight chain, vsrm_handler.py:260-468, which silently degrades
to random init — here the gain is asserted; and its quality-gate intent,
config/policy_v1.yaml:236-251).

Round-4 semantics (train/evalsuite.py): each gain is the MEAN over
N_SEEDS independently drawn batches — the widened randomized degradation
pipeline makes single-batch numbers noise-dominated (measured: VSRM
seed-999 batch +0.16 dB vs +1.15 dB mean). Two gates per model:

- ``ind``: the training family (io/demo.py + train/data._degrade), held
  out by batch seeds;
- ``alt``: the structurally disjoint cross-generator family
  (train/evalgen.py) a training run has never seen — the
  generalization gate.

Thresholds are ~70% of each model's measured post-retrain mean (recorded
in BENCH_RESULTS.md round-4 log), so a silent weight-export regression
fails CI instead of sailing past a 0-dB floor."""

import pytest

from video_enhancer_tpu.train.evalsuite import WEIGHTS_DIR, bundled_gain

N_SEEDS = 6

# model: (ind_gate_db, alt_gate_db), asserted against the CALIBRATED
# serving config (runtime/calibration.py — model_entry bakes each model's
# measured output strength in, so these gates bind exactly what a served
# video gets).
#
# Round-5 closure of the "every alt gate is None" gap: the per-model
# strength sweeps (scripts/{vsr,restore,interp}_strength_sweep.py, tables
# in BENCH_RESULTS.md) found zero crossings of the cross-generator gain
# at usable in-distribution gain for five models — their alt gates are
# 0.0, i.e. the test asserts strictly POSITIVE transfer to the held-out
# generator family. The rest get tight floors at the measured knee, so
# any regression past the calibrated operating point fails CI. The
# tradeoff is explicit: the positive-alt operating points give up ind
# (vsrm +0.841 raw -> +0.438 calibrated) to buy generalization; ind
# gates moved to ~70% of the new calibrated means.
GATES = {
    # s=0.25: +0.438 ind / +0.008 alt (raw alt -0.273).
    "vsrm": (0.3, 0.0),
    # s=0.6: +0.436 ind / +0.035 alt (raw alt -0.031; the zoo's widest
    # positive-alt margin from calibration alone).
    "fast_mamba_vsr": (0.3, 0.0),
    # fast_mamba_vsr_ssd: RETIRED from routing in round 5 (interleaved A/B
    # measured the ssd mixer 1.5-1.7x SLOWER than the ssm scan at serving
    # shapes, BENCH_RESULTS.md round-5 log) but the weights stay bundled
    # for explicit requests; measured +0.039 ind / +0.038 alt at full
    # strength — gated at ~half that so a silent export regression still
    # fails CI.
    "fast_mamba_vsr_ssd": (0.02, 0.02),
    # s=0.25: +0.325 ind / +0.007 alt (raw alt -0.397). The 0.2 ind gate
    # is the price of the positive-alt operating point — rvrt's zero
    # crossing sits at lower ind than the 0.3-gate rule would like.
    "rvrt": (0.2, 0.0),
    # s=0.4: +0.743 ind / -0.067 alt. realesrgan keeps the higher-ind
    # point (its zero crossing at s=0.2 measures a 0.003 alt margin —
    # too thin to gate); the _fast sibling carries the positive gate.
    "realesrgan": (0.5, -0.15),
    # s=0.2: +0.393 ind / +0.010 alt (raw alt -0.539).
    "realesrgan_fast": (0.25, 0.0),
    # s=0.7: +0.099 ind / -0.082 alt — calibration trims a third of the
    # alt harm for 0.001 ind. The weak ind mean is the round-4/5 retrain
    # story (only dual-family-improving chunks accepted).
    "cnn_upscaler": (0.06, -0.15),
    # s=0.5: +1.413 ind / -1.169 alt (raw -3.06 — calibration claws back
    # 1.9 dB of the zoo's worst alt number; no zero crossing exists at
    # usable ind, scripts/restore_strength_sweep.py).
    "ditvr": (1.0, -1.6),
    # seedvr2: strength 0.2 INSIDE models/seedvr2.py (trains through the
    # blended objective): +0.451 ind / -0.084 alt (6 seeds). Requalified
    # -> auto-routable again (weights/QUALIFICATION.json).
    "seedvr2": (0.3, -0.3),
    # s=0.9: +2.035 ind / -0.306 alt — strictly dominates full strength
    # on BOTH families (raw +1.926/-0.376); rife's alt zero crossing
    # sits below s=0.3 where ind drops under 1 dB, not worth it.
    "rife": (1.4, -0.45),
}


@pytest.mark.parametrize("name", sorted(GATES))
def test_bundled_gain_ind(name):
    ind_gate, _ = GATES[name]
    try:
        gain = bundled_gain(name, "ind", n_seeds=N_SEEDS)
    except FileNotFoundError:
        pytest.skip(f"{name} weights not bundled")
    if ind_gate is not None:
        assert gain > ind_gate, \
            f"{name} in-dist gain only {gain:.2f} dB (gate {ind_gate})"


@pytest.mark.parametrize("name", sorted(GATES))
def test_bundled_gain_alt(name):
    _, alt_gate = GATES[name]
    try:
        gain = bundled_gain(name, "alt", n_seeds=N_SEEDS)
    except FileNotFoundError:
        pytest.skip(f"{name} weights not bundled")
    if alt_gate is not None:
        assert gain > alt_gate, \
            f"{name} cross-generator gain only {gain:.2f} dB " \
            f"(gate {alt_gate})"


def test_face_restorer_weights_beat_degraded():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_enhancer_tpu.runtime.face_handler import (_face_net_apply,
                                                         _face_net_init)
    from video_enhancer_tpu.runtime.weights import try_load_params
    from video_enhancer_tpu.train.faces import degrade_faces, make_face_crops
    from video_enhancer_tpu.utils.metrics import psnr

    npz = WEIGHTS_DIR / "face_restorer.npz"
    if not npz.exists():
        pytest.skip("face_restorer.npz not bundled")
    params = _face_net_init(jax.random.PRNGKey(0))
    loaded = try_load_params(npz, params)
    assert loaded is not None
    clean = make_face_crops(4, seed=555_555)
    deg = degrade_faces(clean, np.random.default_rng(9))
    out = _face_net_apply(loaded, jnp.asarray(deg))
    gain = float(psnr(out, jnp.asarray(clean))) - float(
        psnr(jnp.asarray(deg), jnp.asarray(clean)))
    assert gain > 0.7, f"face restorer gain only {gain:.2f} dB"
