"""Agent system tests (mirrors reference test_agent_routing.py coverage)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def demo_video(tmp_path_factory):
    from video_enhancer_tpu.io.demo import write_demo_video

    path = tmp_path_factory.mktemp("vids") / "agents_demo.mp4"
    write_demo_video(path, frames=8, size_hw=(48, 64))
    return str(path)


def test_task_spec_validate_and_roundtrip():
    from video_enhancer_tpu.agents import (
        Quality, TaskSpecification, TaskType, VideoSpecs,
    )

    t = TaskSpecification(
        task_type=TaskType.VIDEO_ENHANCEMENT,
        input_path="/a.mp4", output_path="/b.mp4",
        quality=Quality.HIGH,
        video_specs=VideoSpecs(width=1920, height=1080, fps=30,
                               frame_count=300),
        scale_factor=4,
    )
    assert t.validate() == []
    assert t.video_specs.resolution_class == "1080p"
    assert t.get_scale_factor() == 4
    assert 0 < t.estimate_complexity() <= 1

    t2 = TaskSpecification.from_dict(t.to_dict())
    assert t2.task_type == t.task_type
    assert t2.video_specs.width == 1920

    bad = TaskSpecification(task_type=TaskType.VIDEO_ENHANCEMENT)
    errs = bad.validate()
    assert any("input_path" in e for e in errs)
    assert any("output_path" in e for e in errs)


def test_enhancer_select_model_tree():
    from video_enhancer_tpu.agents import (
        Quality, TaskSpecification, TaskType, VideoEnhancementAgent,
    )

    agent = VideoEnhancementAgent()
    fast = TaskSpecification(task_type=TaskType.FAST_ENHANCEMENT,
                             input_path="x", output_path="y",
                             quality=Quality.FAST)
    assert agent.select_model(fast) == "fast_mamba_vsr"

    zs = TaskSpecification(task_type=TaskType.ZERO_SHOT_ENHANCEMENT,
                           input_path="x", output_path="y")
    assert agent.select_model(zs) == "ditvr"

    qr = TaskSpecification(task_type=TaskType.QUALITY_RESTORATION,
                           input_path="x", output_path="y")
    # QUALITY_RESTORATION prefers seedvr2 only while its measured gain is
    # positive (runtime/qualification.py); with the committed report
    # measuring it negative, auto-dispatch must avoid it.
    expected = ("seedvr2" if "seedvr2" in agent.available
                else agent.select_model(qr))
    assert agent.select_model(qr) == expected
    if "seedvr2" not in agent.available:
        assert agent.select_model(qr) != "seedvr2"

    pref = TaskSpecification(task_type=TaskType.VIDEO_ENHANCEMENT,
                             input_path="x", output_path="y",
                             model_preference="rvrt")
    assert agent.select_model(pref) == "rvrt"

    motion = TaskSpecification(task_type=TaskType.VIDEO_ENHANCEMENT,
                               input_path="x", output_path="y")
    analysis = {"degradations": {}, "content_analysis":
                {"motion_complexity": 0.9}}
    assert agent.select_model(motion, analysis) == "vsrm"


def test_enhancer_processes_task(demo_video, tmp_path):
    from video_enhancer_tpu.agents import (
        Quality, TaskSpecification, TaskType, VideoEnhancementAgent,
    )

    agent = VideoEnhancementAgent()
    out = str(tmp_path / "enhanced.mp4")
    task = TaskSpecification(
        task_type=TaskType.FAST_ENHANCEMENT, input_path=demo_video,
        output_path=out, quality=Quality.FAST,
        model_preference="cnn_upscaler",
    )
    res = agent.process_task(task)
    assert res.status == "success", res.error
    assert res.metrics["model_used"] == "cnn_upscaler"
    assert agent.metrics["tasks_completed"] == 1


def test_quality_assessor(demo_video, tmp_path):
    import shutil

    from video_enhancer_tpu.agents import (
        QualityAssessmentAgent, TaskSpecification, TaskType,
    )

    out = str(tmp_path / "copy.mp4")
    shutil.copy(demo_video, out)
    agent = QualityAssessmentAgent()
    res = agent.process_task(TaskSpecification(
        task_type=TaskType.QUALITY_ASSESSMENT,
        input_path=demo_video, output_path=out,
    ))
    assert res.status == "success", res.error
    m = res.metrics
    # Same file (identical codec round trip) -> near-perfect quality.
    assert m["psnr"] > 35
    assert m["category"] in ("excellent", "good")
    assert not m["needs_reprocessing"]
    assert 0 <= m["overall_score"] <= 1


def test_analyzer_recommendations(demo_video):
    from video_enhancer_tpu.agents import (
        TaskSpecification, TaskType, VideoAnalyzerAgent,
    )

    agent = VideoAnalyzerAgent()
    res = agent.process_task(TaskSpecification(
        task_type=TaskType.VIDEO_ANALYSIS, input_path=demo_video,
    ))
    assert res.status == "success"
    assert res.metrics["recommendations"]
    assert res.metrics["resource_estimate"]["estimated_time_sec"] > 0


def test_coordinator_full_workflow(demo_video, tmp_path):
    from video_enhancer_tpu.agents import CoordinatorAgent

    coord = CoordinatorAgent()
    out = str(tmp_path / "wf_out.mp4")
    wf = coord.run_workflow(demo_video, out, quality="fast",
                            assess_quality=True)
    assert wf.status == "completed", wf.results.get("error")
    assert "analysis" in wf.results
    assert "quality" in wf.results
    assert coord.get_workflow_stats()["completed"] >= 1


def test_communication_broker_and_registry():
    import asyncio

    from video_enhancer_tpu.agents import (
        AgentCommunicationSystem, MessageBroker,
    )
    from video_enhancer_tpu.agents.communication import AgentMessage

    async def run():
        broker = MessageBroker()
        broker.register("a")
        broker.register("b")
        ok = await broker.send(AgentMessage("a", "b", "ping", {"x": 1}))
        assert ok
        msg = await broker.receive("b", timeout=1)
        assert msg.payload == {"x": 1}
        n = await broker.broadcast(AgentMessage("a", "*", "hello"))
        assert n == 1
        assert not await broker.send(AgentMessage("a", "ghost", "x"))

    asyncio.run(run())

    comm = AgentCommunicationSystem()
    comm.register_agent("w1")
    comm.registry._agents["w1"]["last_heartbeat"] -= 1000
    assert comm.registry.check_timeouts() == ["w1"]
    assert comm.registry.get_status()["w1"]["status"] == "unavailable"
    comm.registry.heartbeat("w1")
    assert comm.registry.get_status()["w1"]["status"] == "available"


def test_rejection_paths():
    from video_enhancer_tpu.agents import (
        TaskSpecification, TaskType, VideoEnhancementAgent,
    )

    agent = VideoEnhancementAgent()
    res = agent.process_task(TaskSpecification(
        task_type=TaskType.VIDEO_ANALYSIS, input_path="x",
    ))
    assert res.status == "rejected"
    assert "unsupported" in res.error


def test_lpips_proxy_calibration():
    """The bundled perceptual metric must rank-correlate (Spearman >= 0.8)
    with true (PSNR-derived) quality ordering on held-out distortion
    ladders (VERDICT r1 item 8; reference quality_agent.py:351-448 uses
    VGG LPIPS, unavailable under zero egress)."""
    import pathlib

    import jax
    import pytest

    from video_enhancer_tpu.io.demo import make_demo_frames
    from video_enhancer_tpu.runtime.weights import try_load_params
    from video_enhancer_tpu.train.lpips import (feat_init,
                                                severity_ladder_corr)

    npz = pathlib.Path("video_enhancer_tpu/weights/lpips_proxy.npz")
    if not npz.exists():
        pytest.skip("lpips_proxy.npz not bundled")
    loaded = try_load_params(npz,
                             {"layers": feat_init(jax.random.PRNGKey(0))})
    assert loaded is not None
    frames = make_demo_frames(16, (160, 160))
    corr = severity_ladder_corr(loaded["layers"], frames, n_ladders=8,
                                seed=777)
    assert corr >= 0.8, f"held-out Spearman {corr:.3f} < 0.8"
