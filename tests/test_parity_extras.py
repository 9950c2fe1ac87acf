"""Parity extras: deblur, size aliases, fallback manager, debug, training."""

import numpy as np
import pytest


def test_deblur_modules_identity_untrained():
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.models import deblur

    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 3),
                                                    np.float32))
    p1 = deblur.bsstnet_init(jax.random.PRNGKey(0), dim=8)
    assert float(jnp.max(jnp.abs(deblur.bsstnet_apply(p1, x) - x))) < 1e-6
    p2 = deblur.vddiff_init(jax.random.PRNGKey(1), dim=8)
    assert float(jnp.max(jnp.abs(deblur.vddiff_apply(p2, x) - x))) < 1e-6


def test_seedvr2_size_presets():
    from video_enhancer_tpu.models.ditvr import SIZE_PRESETS

    # Preset dims are sized so the ACTUAL param count matches the name
    # (~18*dim^2*depth for an AdaLN DiT block): 3b -> 3.06B, 7b -> 7.1B.
    assert SIZE_PRESETS["3b"] == {"dim": 2304, "depth": 32, "heads": 24}
    assert SIZE_PRESETS["7b"] == {"dim": 3072, "depth": 42, "heads": 24}
    for name, cfg in (("3b", SIZE_PRESETS["3b"]),
                      ("7b", SIZE_PRESETS["7b"])):
        approx = 18 * cfg["dim"] ** 2 * cfg["depth"]
        target = float(name.replace("b", "")) * 1e9
        assert 0.85 * target < approx < 1.15 * target, (name, approx)

    from video_enhancer_tpu.models.seedvr2_sizes import make_seedvr2

    params, meta, apply = make_seedvr2("small")
    assert meta["preset"] == "small"
    assert len(params["blocks"]) == meta["depth"]


def test_fallback_manager_uses_hierarchy(monkeypatch):
    from video_enhancer_tpu.runtime import fallback as fb

    calls = []

    def fake_build(name, policy=None):
        calls.append(name)
        if name in ("vsrm", "rvrt"):
            raise RuntimeError(f"{name} broken")
        return f"handler:{name}"

    mgr = fb.ModelFallbackManager(build_timeout_sec=5)
    monkeypatch.setattr(mgr, "_build_with_timeout", lambda n: fake_build(n))
    handler, used = mgr.load_model_with_fallbacks("vsrm")
    assert used == "fast_mamba_vsr"
    assert calls == ["vsrm", "rvrt", "fast_mamba_vsr"]
    hist = mgr.get_history()
    assert [h["ok"] for h in hist] == [False, False, True]


def test_timed_operation_and_context():
    import logging

    from video_enhancer_tpu.utils.debug import TimedOperation, debug_context

    with TimedOperation("outer") as t:
        with debug_context("inner"):
            pass
    assert t.elapsed >= 0


def test_training_step_reduces_loss():
    """A few steps on a fixed batch must reduce the loss (real learning)."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.models import upscaler
    from video_enhancer_tpu.parallel.mesh import make_mesh
    from video_enhancer_tpu.train.step import make_optimizer, make_train_step

    params, _ = upscaler.init(jax.random.PRNGKey(0), features=16, depth=1,
                              s2d=2, scale=2)

    def apply_clip(p, clip):
        b, t = clip.shape[0], clip.shape[1]
        frames = clip.reshape((b * t,) + clip.shape[2:])
        out = upscaler.apply(p, frames, scale=2, s2d=2)
        return out.reshape((b, t) + out.shape[1:])

    mesh = make_mesh()
    init_state, train_step, shard_batch = make_train_step(
        apply_clip, make_optimizer(lr=1e-3), mesh
    )
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.random((2, 2, 32, 32, 3), np.float32))
    lr = jnp.asarray(
        np.stack([[np.asarray(hr)[b, t][::2, ::2] for t in range(2)]
                  for b in range(2)])
    )
    with mesh:
        state = init_state(params)
        losses = []
        batch = shard_batch({"lr": lr, "hr": hr})
        for _ in range(8):
            state, m = train_step(state, batch)
            losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_synthetic_data_pipeline():
    from video_enhancer_tpu.io.demo import make_demo_frames
    from video_enhancer_tpu.train.data import make_pairs

    frames = make_demo_frames(8, (64, 64))
    batch = make_pairs(frames, batch=2, clip_len=3, crop=32, scale=2, seed=0)
    assert batch["hr"].shape == (2, 3, 32, 32, 3)
    assert batch["lr"].shape == (2, 3, 16, 16, 3)
    assert 0.0 <= batch["lr"].min() and batch["lr"].max() <= 1.0
    # degradation actually degrades
    import cv2

    up = np.stack([
        cv2.resize(batch["lr"][0, t], (32, 32), interpolation=cv2.INTER_CUBIC)
        for t in range(3)
    ])
    assert np.abs(up - batch["hr"][0]).mean() > 0.005


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.models import upscaler
    from video_enhancer_tpu.parallel.mesh import make_mesh
    from video_enhancer_tpu.train.checkpoint import (
        export_params, restore_checkpoint, save_checkpoint,
    )
    from video_enhancer_tpu.train.step import make_optimizer, make_train_step

    params, _ = upscaler.init(jax.random.PRNGKey(0), features=8, depth=1,
                              s2d=2)

    def apply_clip(p, clip):
        b, t = clip.shape[0], clip.shape[1]
        f = clip.reshape((b * t,) + clip.shape[2:])
        out = upscaler.apply(p, f, scale=2, s2d=2)
        return out.reshape((b, t) + out.shape[1:])

    mesh = make_mesh()
    init_state, train_step, shard_batch = make_train_step(
        apply_clip, make_optimizer(), mesh
    )
    with mesh:
        state = init_state(params)
        batch = shard_batch({
            "lr": jnp.ones((1, 2, 8, 8, 3)),
            "hr": jnp.ones((1, 2, 16, 16, 3)),
        })
        state, _ = train_step(state, batch)
        step = save_checkpoint(tmp_path / "ck", state)
        assert step == 1

        fresh = init_state(params)
        restored = restore_checkpoint(tmp_path / "ck", fresh)
        assert restored is not None
        assert int(restored.step) == 1
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        assert np.allclose(np.asarray(a), np.asarray(b))

        path = export_params(tmp_path / "w.npz", state)
        from video_enhancer_tpu.runtime.weights import try_load_params

        loaded = try_load_params(path, params)
        assert loaded is not None


def test_production_config_env(monkeypatch):
    from video_enhancer_tpu.config.production import ProductionConfig

    monkeypatch.setenv("VETPU_PORT", "9999")
    monkeypatch.setenv("VETPU_REQUIRE_AUTH", "true")
    cfg = ProductionConfig.from_env()
    assert cfg.port == 9999
    assert cfg.require_auth is True
    assert cfg.validate() == []
    bad = ProductionConfig(port=99999)
    assert bad.validate()


def test_rollback_mode(tmp_path, monkeypatch):
    """validate --mode rollback cancels in-flight jobs via the store and
    clears scratch dirs (reference validate_deployment.py:637-707, minus
    the pkill)."""
    from video_enhancer_tpu.runtime.jobstore import JobStatus, JobStore
    from video_enhancer_tpu.validate import run_rollback

    data = tmp_path / "data"
    store = JobStore(data / "jobs.sqlite")
    live = store.create({"status": JobStatus.PROCESSING})
    done = store.create({"status": JobStatus.COMPLETED})
    (data / "tmp").mkdir(parents=True)
    (data / "tmp" / "x.bin").write_text("junk")

    steps = run_rollback(str(data))
    assert steps["ok"]
    assert steps["cancel_jobs"]["cancelled"] == 1
    assert store.get(live)["status"] == JobStatus.CANCELLED
    assert store.get(done)["status"] == JobStatus.COMPLETED
    assert not (data / "tmp" / "x.bin").exists()
    assert (data / "tmp").is_dir()
    assert steps["git_reset"].get("skipped")


def test_add_license_headers_script(tmp_path):
    """SPDX header tool is idempotent and --check mode flags misses
    (reference scripts/add_license_headers.py)."""
    import subprocess
    import sys
    from pathlib import Path

    script = str(Path(__file__).parent.parent / "scripts" /
                 "add_license_headers.py")
    f = tmp_path / "m.py"
    f.write_text("#!/usr/bin/env python3\nx = 1\n")
    r = subprocess.run([sys.executable, script, "--check", str(tmp_path)],
                       capture_output=True, text=True)
    assert r.returncode == 1 and "m.py" in r.stdout
    assert subprocess.run([sys.executable, script, str(tmp_path)],
                          capture_output=True).returncode == 0
    text = f.read_text()
    assert text.startswith("#!/usr/bin/env python3\n"
                           "# SPDX-License-Identifier: MIT\n")
    subprocess.run([sys.executable, script, str(tmp_path)],
                   capture_output=True)
    assert f.read_text() == text  # idempotent
    r = subprocess.run([sys.executable, script, "--check", str(tmp_path)],
                       capture_output=True, text=True)
    assert r.returncode == 0
