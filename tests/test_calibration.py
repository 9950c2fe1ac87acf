"""Calibrated output strength (runtime/calibration.py): the zero-training
restoration-strength control that closed the round-4 cross-generator gap
for half the zoo (see tests/test_bundled_weights.py GATES).

Covers: the blend math per model kind, the identity fast path at s=1, the
env override, and that train/evalsuite.model_entry serves the SAME
calibrated apply the handlers do (the no-drift invariant the gates rely
on)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_enhancer_tpu.ops import resize
from video_enhancer_tpu.runtime.calibration import (CALIBRATED_STRENGTH,
                                                    calibrate_interp,
                                                    calibrate_restore,
                                                    calibrate_vsr,
                                                    strength_for)


def test_strength_env_override(monkeypatch):
    monkeypatch.setenv("VETPU_STRENGTH_VSRM", "0.77")
    assert strength_for("vsrm") == pytest.approx(0.77)
    monkeypatch.delenv("VETPU_STRENGTH_VSRM")
    assert strength_for("vsrm") == CALIBRATED_STRENGTH["vsrm"]
    assert strength_for("no_such_model") == 1.0


def test_identity_at_full_strength(monkeypatch):
    monkeypatch.setenv("VETPU_STRENGTH_X", "1.0")
    fn = lambda p, x: x * 2  # noqa: E731
    assert calibrate_vsr("x", fn) is fn
    assert calibrate_restore("x", fn) is fn
    assert calibrate_interp("x", fn) is fn


def test_vsr_blend_matches_formula(monkeypatch):
    monkeypatch.setenv("VETPU_STRENGTH_X", "0.25")
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.random((1, 2, 8, 8, 3), dtype=np.float32))

    def fake_vsr(p, x):  # 4x "model": nearest-upscaled, brightened
        up = resize(x, (32, 32), method="nearest")
        return jnp.clip(up + 0.1, 0.0, 1.0)

    out = calibrate_vsr("x", fake_vsr)(None, clip)
    base = jnp.clip(resize(clip, (32, 32), method="cubic"), 0.0, 1.0)
    want = jnp.clip(0.25 * fake_vsr(None, clip) + 0.75 * base, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-6)
    # Works for 4D frame batches too (cnn_upscaler handler path).
    frames = clip[:, 0]
    out4 = calibrate_vsr("x", fake_vsr)(None, frames)
    assert out4.shape == (1, 32, 32, 3)


def test_restore_and_interp_blends(monkeypatch):
    monkeypatch.setenv("VETPU_STRENGTH_X", "0.5")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 2, 8, 8, 3), dtype=np.float32)) * 0.5

    restored = calibrate_restore("x", lambda p, v: v * 0.0)(None, x)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(x) * 0.5,
                               atol=1e-6)

    f0 = jnp.zeros((1, 8, 8, 3), jnp.float32)
    f1 = jnp.ones((1, 8, 8, 3), jnp.float32)
    mid = calibrate_interp("x", lambda p, a, b: b)(None, f0, f1)
    # 0.5 * f1 + 0.5 * avg(f0, f1) = 0.75
    np.testing.assert_allclose(np.asarray(mid), 0.75, atol=1e-6)


def test_model_entry_serves_calibrated_apply(monkeypatch):
    """The gates measure what serving runs: model_entry's apply must equal
    raw model output blended at the shipped strength."""
    from video_enhancer_tpu.models import upscaler
    from video_enhancer_tpu.train import evalsuite

    s = CALIBRATED_STRENGTH["cnn_upscaler"]
    assert 0.0 < s < 1.0
    init_fn, apply_fn, _, kind = evalsuite.model_entry("cnn_upscaler")
    assert kind == "vsr2"
    params = init_fn()
    rng = np.random.default_rng(2)
    clip = jnp.asarray(rng.random((1, 2, 8, 8, 3), dtype=np.float32))
    got = apply_fn(params, clip)

    frames = clip.reshape((-1, 8, 8, 3))
    raw = upscaler.apply(params, frames, scale=2, s2d=4)
    raw = raw.reshape((1, 2) + raw.shape[1:])
    base = jnp.clip(resize(clip, (16, 16), method="cubic"), 0.0, 1.0)
    want = jnp.clip(s * raw + (1.0 - s) * base, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_seedvr2_not_double_blended():
    """seedvr2's strength lives inside models/seedvr2.apply; the generic
    table must not wrap it again."""
    assert "seedvr2" not in CALIBRATED_STRENGTH
    assert strength_for("seedvr2") == 1.0


def test_registry_vsr_handler_serves_calibrated_blend(monkeypatch):
    """registry._build must wrap the clip apply with the calibrated
    strength — otherwise serving drifts from what the gates measure."""
    monkeypatch.setenv("VETPU_STRENGTH_REALESRGAN_FAST", "0.5")
    from video_enhancer_tpu.config import load_policy
    from video_enhancer_tpu.models import realesrgan as m
    from video_enhancer_tpu.runtime import registry

    h = registry._build("realesrgan_fast", load_policy(), seed=0)
    rng = np.random.default_rng(3)
    clip = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    got = h.process_clip(clip)[None]
    clip = clip[None]

    def raw_clip_apply(p, c):
        b, t = c.shape[0], c.shape[1]
        out = m.apply(p, c.reshape((b * t,) + c.shape[2:]), scale=4)
        return out.reshape((b, t) + out.shape[1:])

    want = calibrate_vsr("realesrgan_fast", raw_clip_apply)(h.params, clip)
    # The handler computes in bfloat16; the fp32 reference agrees to
    # bf16 precision. The no-op alternative (raw output) differs by far
    # more than that, so the tolerance still proves the wrapper is wired.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)
    raw = jnp.clip(raw_clip_apply(h.params, clip), 0, 1)
    assert float(jnp.max(jnp.abs(want - raw))) > 6e-2


def test_rife_handler_serves_calibrated_mid(monkeypatch):
    monkeypatch.setenv("VETPU_STRENGTH_RIFE", "0.5")
    from video_enhancer_tpu.models import rife
    from video_enhancer_tpu.runtime.rife_handler import RIFEHandler

    h = RIFEHandler(dim=8, levels=2)
    rng = np.random.default_rng(4)
    f0 = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    f1 = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    got = h._mid(h.params, f0, f1)

    def raw_mid(p, a, b):
        return rife.interpolate_pair(
            p, a.astype(h.compute_dtype), b.astype(h.compute_dtype))

    want = calibrate_interp("rife", raw_mid)(h.params, f0, f1)
    # bf16 compute: the handler averages the base pair in bf16, the fp32
    # reference before casting — agreement to a bf16 ulp proves wiring.
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want, dtype=np.float32),
                               atol=1e-2)
