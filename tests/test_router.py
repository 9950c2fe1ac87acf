"""Degradation scoring + routing tests (mirrors reference
tests/test_smoke_e2e.py:93-138 score-range asserts)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def demo_video(tmp_path_factory):
    from video_enhancer_tpu.io.demo import write_demo_video

    path = tmp_path_factory.mktemp("vids") / "router_demo.mp4"
    write_demo_video(path, frames=16, size_hw=(64, 96))
    return str(path)


def test_degradation_scores_ranges():
    import jax.numpy as jnp

    from video_enhancer_tpu.ops.degradation import degradation_scores

    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.random((4, 64, 64, 3), np.float32))
    s = degradation_scores(clip)
    for k, v in s.items():
        if k in ("brightness", "contrast"):
            continue
        assert 0.0 <= float(v) <= 1.0, (k, float(v))


def test_noise_score_orders_noisy_vs_clean():
    import jax.numpy as jnp

    from video_enhancer_tpu.ops.degradation import noise_score

    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    clean = np.stack([np.stack([yy, xx, yy * xx], -1)] * 3).astype(np.float32)
    noisy = np.clip(clean + rng.normal(0, 0.08, clean.shape), 0, 1).astype(
        np.float32
    )
    assert float(noise_score(jnp.asarray(noisy))) > float(
        noise_score(jnp.asarray(clean))
    )


def test_low_light_orders_dark_vs_bright():
    import jax.numpy as jnp

    from video_enhancer_tpu.ops.degradation import low_light_score

    dark = jnp.full((2, 32, 32, 3), 0.05)
    bright = jnp.full((2, 32, 32, 3), 0.6)
    assert float(low_light_score(dark)) > float(low_light_score(bright))


def test_blur_orders_blurry_vs_sharp():
    import cv2
    import jax.numpy as jnp

    from video_enhancer_tpu.io.demo import make_demo_frames
    from video_enhancer_tpu.ops.degradation import blur_score

    frames = make_demo_frames(2, (64, 96)).astype(np.float32) / 255.0
    blurred = np.stack([cv2.GaussianBlur(f, (15, 15), 5) for f in frames])
    assert float(blur_score(jnp.asarray(blurred))) > float(
        blur_score(jnp.asarray(frames))
    )


def test_analyze_and_route_plan_shape(demo_video):
    from video_enhancer_tpu.analysis import DegradationRouter

    router = DegradationRouter()
    plan = router.analyze_and_route(demo_video)
    assert set(plan) >= {
        "degradations", "content_analysis", "expert_routing",
        "processing_order", "confidence_score",
    }
    primary = plan["expert_routing"]["primary_model"]
    assert primary in {"vsrm", "seedvr2", "ditvr", "fast_mamba_vsr",
                       "realesrgan", "cnn_upscaler", "bicubic"}
    for v in plan["degradations"].values():
        assert 0.0 <= v <= 1.0
    assert any(s.startswith("sota_") for s in plan["processing_order"])
    assert 0.0 <= plan["confidence_score"] <= 1.0


def test_strict_latency_prefers_fast_model(demo_video):
    from video_enhancer_tpu.analysis import DegradationRouter

    router = DegradationRouter()
    plan = router.analyze_and_route(demo_video, latency_class="strict")
    assert plan["expert_routing"]["primary_model"] == "fast_mamba_vsr"


def test_router_fallback_on_missing_file():
    from video_enhancer_tpu.analysis import DegradationRouter

    plan = DegradationRouter().analyze_and_route("/nonexistent/file.mp4")
    assert plan.get("fallback") is True
    assert plan["confidence_score"] == 0.0


def test_restricted_availability(demo_video):
    from video_enhancer_tpu.analysis import DegradationRouter

    router = DegradationRouter(available_models={"bicubic"})
    plan = router.analyze_and_route(demo_video)
    assert plan["expert_routing"]["primary_model"] == "bicubic"
