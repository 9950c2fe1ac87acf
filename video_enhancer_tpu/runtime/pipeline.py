"""The auto pipeline: route -> preprocess -> model -> experts -> encode.

Re-creates the reference's SOTA pipeline flow (reference app.py:852-984:
analyze_and_route -> _preprocess_video -> primary handler -> optional face /
temporal smoothing / HFR -> output) with device-side experts and the shared
VSR handler machinery. On any model failure it falls back to bicubic
(reference app.py:922-932 _fallback_basic_upscale).
"""

from __future__ import annotations

import logging
import tempfile
import time
from pathlib import Path

from ..analysis import DegradationRouter
from ..config import default_policy
from .registry import build_handler

log = logging.getLogger(__name__)

__all__ = ["run_auto_pipeline"]


def run_auto_pipeline(
    input_path,
    output_path,
    engine: str = "auto",
    scale: int | None = None,
    latency_class: str = "standard",
    enable_face_expert: bool | None = None,
    enable_hfr: bool | None = None,
    enable_temporal_smoothing: bool | None = None,
    policy=None,
) -> dict:
    policy = policy or default_policy()
    t0 = time.time()

    from .registry import probe_available

    router = DegradationRouter(policy, available_models=probe_available(policy))
    if engine == "auto":
        plan = router.analyze_and_route(
            input_path, latency_class=latency_class,
            enable_face_expert=enable_face_expert, enable_hfr=enable_hfr,
        )
        primary = plan["expert_routing"]["primary_model"]
    else:
        plan = router.analyze_and_route(
            input_path, latency_class=latency_class,
            enable_face_expert=enable_face_expert, enable_hfr=enable_hfr,
        )
        primary = engine
        plan["expert_routing"]["primary_model"] = primary
        order = [s for s in plan["processing_order"] if not s.startswith("sota_")]
        plan["processing_order"] = order[:1] + [f"sota_{primary}"] + order[1:]

    experts = plan["expert_routing"].get("experts", {})
    work_input = str(input_path)
    tmp_files: list[str] = []

    try:
        # -- preprocessing ------------------------------------------------
        if "preprocessing" in plan["processing_order"]:
            work_input = _preprocess_video(work_input, experts, tmp_files)

        # -- primary model ------------------------------------------------
        try:
            handler = build_handler(primary, policy)
            if hasattr(handler, "update_context") and handler.context:
                _apply_degradation_context(handler, plan)
            stats = handler.enhance_video(work_input, output_path)
        except Exception as e:
            log.warning("primary model %s failed (%s); bicubic fallback",
                        primary, e)
            handler = build_handler("bicubic", policy)
            stats = handler.enhance_video(work_input, output_path)
            stats["fallback_from"] = primary
            stats["fallback_error"] = str(e)

        # -- post experts -------------------------------------------------
        post = [s for s in plan["processing_order"]
                if s in ("face_restoration", "temporal_consistency",
                         "hfr_interpolation")]
        for stage in post:
            try:
                if stage == "temporal_consistency" or (
                        enable_temporal_smoothing and
                        stage == "temporal_consistency"):
                    _apply_temporal_smoothing(output_path)
                    stats["temporal_smoothing"] = True
                elif stage == "face_restoration":
                    from .face_handler import FaceRestorationExpert

                    FaceRestorationExpert().process_video_selective(
                        output_path, output_path
                    )
                    stats["face_restoration"] = True
                elif stage == "hfr_interpolation":
                    from .rife_handler import RIFEHandler

                    tmp = output_path + ".hfr.mp4"
                    RIFEHandler().interpolate_video(output_path, tmp,
                                                    interpolation_factor=2)
                    Path(tmp).replace(output_path)
                    stats["hfr"] = True
            except Exception as e:  # post experts are best-effort
                log.warning("post stage %s failed: %s", stage, e)
                stats[f"{stage}_error"] = str(e)

        stats["routing_plan"] = plan
        stats["total_time_sec"] = time.time() - t0
        return stats
    finally:
        for f in tmp_files:
            Path(f).unlink(missing_ok=True)


def _apply_degradation_context(handler, plan: dict) -> None:
    """Feed the router's degradation estimate into conditioned models
    (DiTVR's zero-shot conditioning; reference ditvr_handler.py:718-788)."""
    deg = plan.get("degradations", {})
    scores = [float(deg.get("noise", 0.0)),
              float(deg.get("motion_blur", 0.0)),
              float(deg.get("compression", 0.0))]
    # DEG_TYPES = (unknown, noise, blur, compression)
    dtype_idx = 0
    if max(scores) > 0.3:
        dtype_idx = 1 + int(max(range(3), key=lambda i: scores[i]))
    handler.update_context(degradation_scores=scores,
                           degradation_type=dtype_idx)


def _preprocess_video(input_path: str, experts: dict,
                      tmp_files: list[str]) -> str:
    """Run the jitted preprocess graph over the whole video."""
    import jax.numpy as jnp
    import numpy as np

    from ..io.video import get_video_metadata, read_video, write_video
    from .experts import preprocess_clip

    meta = get_video_metadata(input_path)
    frames = read_video(input_path).astype(np.float32) / 255.0
    out = preprocess_clip(
        jnp.asarray(frames),
        do_denoise=bool(experts.get("denoise")),
        do_lowlight=bool(experts.get("low_light")),
        do_compression=bool(experts.get("compression_cleanup")),
    )
    out_u8 = np.clip(np.round(np.asarray(out) * 255.0), 0, 255).astype(np.uint8)
    tmp = tempfile.mktemp(suffix=".mp4")
    write_video(tmp, out_u8, fps=meta.fps)
    tmp_files.append(tmp)
    return tmp


def _apply_temporal_smoothing(path) -> None:
    import numpy as np

    from ..io.video import get_video_metadata, read_video, write_video
    from .experts import temporal_smooth

    meta = get_video_metadata(path)
    frames = read_video(path).astype(np.float32) / 255.0
    out = temporal_smooth(frames)
    write_video(path, np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8),
                fps=meta.fps)
