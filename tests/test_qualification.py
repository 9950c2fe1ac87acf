"""Measured quality drives routing (round-5 invariant): no model whose
bundled weights measure <= 0 dB gain may be auto-routed; explicit request
still works. Matches the reference's quality-gate intent
(config/policy_v1.yaml:236-251) wired into its availability probing
(degradation_router.py:72-108) — which the reference never actually does."""

import json

import pytest

from video_enhancer_tpu.analysis.router import DegradationRouter
from video_enhancer_tpu.runtime import qualification
from video_enhancer_tpu.runtime.registry import probe_available


@pytest.fixture
def neg_seedvr2_report(tmp_path, monkeypatch):
    """A qualification report measuring seedvr2 at a negative ind mean
    (the round-4 measured state: -2.73 dB)."""
    rep = tmp_path / "QUALIFICATION.json"
    rep.write_text(json.dumps({
        "n_seeds": 6,
        "models": {
            "seedvr2": {"ind": -2.73, "alt": -4.99},
            "vsrm": {"ind": 0.84, "alt": -0.27},
            "rife": {"ind": 1.93, "alt": -0.38},
        },
    }))
    monkeypatch.setenv("VETPU_QUALIFICATION", str(rep))
    return rep


def test_disqualified_models_from_report(neg_seedvr2_report):
    assert qualification.disqualified_models() == {"seedvr2"}


def test_missing_report_fails_open(tmp_path, monkeypatch):
    monkeypatch.setenv("VETPU_QUALIFICATION", str(tmp_path / "nope.json"))
    assert qualification.disqualified_models() == set()
    assert qualification.load_report() == {}


def test_probe_available_demotes_negative(neg_seedvr2_report):
    avail = probe_available()
    assert "seedvr2" not in avail
    assert "vsrm" in avail  # positive gain stays routable
    # Explicit-request path sees the raw set.
    assert "seedvr2" in probe_available(include_disqualified=True)


def test_router_never_plans_negative_model(neg_seedvr2_report):
    """A compression-heavy video must NOT route to seedvr2 while its
    measured mean gain is negative (the reference's rule
    `compression > thr -> seedvr2`, degradation_router.py:446-453, is
    gated here on measured quality)."""
    router = DegradationRouter()
    assert "seedvr2" not in router.available
    deg = {"compression": 0.9, "motion_blur": 0.7, "low_light": 0.1,
           "noise": 0.2, "temporal_inconsistency": 0.3, "unknown": 0.1}
    content = {"motion_complexity": 0.2, "frame_count": 24}
    from video_enhancer_tpu.config import LatencyClass

    primary = router._select_model(deg, content, LatencyClass.STANDARD,
                                   allow_diffusion=True,
                                   allow_zero_shot=True)
    assert primary != "seedvr2"
    assert primary in router.available


def test_enhancer_explicit_preference_bypasses_qualification(
        neg_seedvr2_report):
    from video_enhancer_tpu.agents.enhancer import VideoEnhancementAgent
    from video_enhancer_tpu.agents.task_spec import (TaskSpecification,
                                                     TaskType, VideoSpecs)

    agent = VideoEnhancementAgent()
    assert "seedvr2" not in agent.available
    spec = TaskSpecification(
        task_type=TaskType.QUALITY_RESTORATION,
        input_path="in.mp4", output_path="out.mp4",
        video_specs=VideoSpecs(width=64, height=64, fps=24, frame_count=8),
        model_preference="seedvr2",
    )
    assert agent.select_model(spec) == "seedvr2"
    # Without the explicit preference, auto dispatch avoids it.
    spec2 = TaskSpecification(
        task_type=TaskType.QUALITY_RESTORATION,
        input_path="in.mp4", output_path="out.mp4",
        video_specs=VideoSpecs(width=64, height=64, fps=24, frame_count=8),
    )
    assert agent.select_model(spec2) != "seedvr2"


def test_committed_report_consistency():
    """The committed report (if present) must be well-formed, and any model
    it measures at ind <= 0 must be absent from a fresh router's
    availability set — the self-healing property end to end."""
    models = qualification.load_report()
    if not models:
        pytest.skip("no committed QUALIFICATION.json")
    router = DegradationRouter()
    for name, entry in models.items():
        assert isinstance(entry, dict) and "ind" in entry, name
        if entry["ind"] <= 0.0:
            assert name not in router.available
            assert name not in probe_available()
