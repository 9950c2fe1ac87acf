"""Policy loading tests (the reference never loads its YAML; we must)."""

from video_enhancer_tpu.config import (
    LatencyClass,
    default_policy,
    load_policy,
)


def test_policy_loads_and_is_typed():
    p = load_policy()
    assert p.version == "1.0-tpu"
    assert p.thresholds.compression == 0.6
    assert p.thresholds.motion_complexity == 0.7
    assert p.budget("strict").max_ms_per_frame == 500
    assert p.budget(LatencyClass.FLEXIBLE).max_memory_gb == 24
    assert p.quality_gates.min_psnr == 25.0


def test_all_four_sota_models_present():
    p = default_policy()
    for name in ("vsrm", "seedvr2", "ditvr", "fast_mamba_vsr"):
        assert name in p.models, name
        assert p.models[name].enabled
    assert p.models["vsrm"].scale == 4
    assert p.models["ditvr"].tile == 224


def test_env_override_weights(monkeypatch, tmp_path):
    monkeypatch.setenv("VSRM_DIR", str(tmp_path))
    p = load_policy()
    assert p.models["vsrm"].weights_path == str(tmp_path)


def test_mesh_defaults():
    p = default_policy()
    assert p.mesh.num_devices == 1
