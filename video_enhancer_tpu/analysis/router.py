"""DegradationRouter: analyze a video, choose the restoration plan.

Re-implements the reference router's public contract (reference
models/analysis/degradation_router.py:110-188): ``analyze_and_route`` returns
a plan dict with ``degradations``, ``content_analysis``, ``expert_routing``,
``processing_order`` and ``confidence_score``. Differences from the reference:

- all degradation scoring is one jitted device graph (ops/degradation.py)
  instead of per-frame cv2 loops;
- thresholds and model decisions come from the *loaded* policy file
  (config/policy_v1.yaml) — the reference hardcodes them
  (degradation_router.py:57-64) and never loads its YAML;
- face detection stays host-side (cv2 Haar cascade, as the reference
  degradation_router.py:310-320).
"""

from __future__ import annotations

import time
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..config import LatencyClass, Policy, default_policy
from ..io.video import get_video_metadata, sample_frames
from ..ops.degradation import degradation_scores
from ..utils.perf import get_tracker
from .faces import face_chain_trusted

__all__ = ["DegradationRouter"]


def _detect_faces_ratio(frames: np.ndarray) -> float:
    """Face prominence: mean face-area ratio over sampled frames
    (reference degradation_router.py:310-320)."""
    try:
        from .faces import face_area_ratio

        return face_area_ratio(frames)
    except Exception:
        return 0.0


class DegradationRouter:
    def __init__(self, policy: Policy | None = None,
                 available_models: set[str] | None = None):
        self.policy = policy or default_policy()
        if available_models is None:
            # Enabled minus measured-negative models (runtime/
            # qualification.py): a model whose bundled weights measure
            # <= 0 dB gain must never be an auto-routed primary. The
            # reference auto-routes blind (degradation_router.py:418-471).
            from ..runtime.qualification import disqualified_models

            available_models = (set(self.policy.enabled_models())
                                - disqualified_models())
        self.available = available_models

    # -- public API --------------------------------------------------------
    def analyze_and_route(
        self,
        video_path,
        latency_class: str | LatencyClass = LatencyClass.STANDARD,
        allow_diffusion: bool = True,
        allow_zero_shot: bool = True,
        license_mode: str = "permissive",
        enable_face_expert: bool | None = None,
        enable_hfr: bool | None = None,
        num_samples: int = 12,
    ) -> dict[str, Any]:
        tracker = get_tracker()
        op = tracker.start_operation("analysis", "router", path=str(video_path))
        t0 = time.time()
        try:
            lc = LatencyClass(latency_class) if isinstance(latency_class, str) \
                else latency_class
            defaults = self.policy.defaults
            if enable_face_expert is None:
                # Auto mode defers to the measured validity of the face
                # detector chain (docs/FACE_VALIDITY.json, written by
                # scripts/face_validity.py): if its worst-stratum recall
                # is below the trust floor, the face expert stays off —
                # an explicit enable_face_expert=True still overrides.
                # (The reference trusts its downloaded detectors blindly,
                # face_restoration_expert.py:490-577.)
                enable_face_expert = (defaults.enable_face_expert
                                      and face_chain_trusted())
            if enable_hfr is None:
                enable_hfr = defaults.enable_hfr

            meta = get_video_metadata(video_path)
            frames = sample_frames(video_path, num_samples=num_samples)
            clip = jnp.asarray(frames).astype(jnp.float32) / 255.0
            scores = {k: float(v) for k, v in degradation_scores(clip).items()}
            face_ratio = _detect_faces_ratio(frames)

            degradations = {
                "compression": scores["compression"],
                "motion_blur": scores["motion_blur"],
                "low_light": scores["low_light"],
                "noise": scores["noise"],
                "temporal_inconsistency": scores["temporal_inconsistency"],
                "unknown": self._unknown_score(scores),
            }
            content = {
                "face_prominence": face_ratio,
                "scene_change_ratio": scores["scene_change_ratio"],
                "motion_complexity": scores["motion_complexity"],
                "brightness": scores["brightness"],
                "contrast": scores["contrast"],
                "resolution": [meta.height, meta.width],
                "frame_count": meta.frame_count,
                "fps": meta.fps,
            }

            primary = self._select_model(
                degradations, content, lc, allow_diffusion, allow_zero_shot
            )
            plan = self._build_plan(
                primary, degradations, content, lc,
                enable_face_expert, enable_hfr,
            )
            plan["confidence_score"] = self._confidence(degradations, content)
            plan["analysis_time_sec"] = time.time() - t0
            tracker.finish_operation(op, success=True)
            return plan
        except Exception as e:
            tracker.finish_operation(op, success=False, error=str(e))
            return self._fallback_plan(str(e))

    # -- internals ---------------------------------------------------------
    def _unknown_score(self, scores: dict) -> float:
        """High when no single degradation dominates but quality is bad
        (the reference routes 'unknown>0.6' to DiTVR zero-shot,
        degradation_router.py:430-434)."""
        known = [scores["compression"], scores["motion_blur"],
                 scores["noise"], scores["low_light"]]
        overall = max(scores["temporal_inconsistency"], np.mean(known))
        dominance = max(known) - np.mean(known)
        return float(np.clip(overall - dominance, 0.0, 1.0))

    def _select_model(self, deg, content, lc, allow_diffusion, allow_zero_shot):
        """Decision tree (reference degradation_router.py:418-471)."""
        thr = self.policy.thresholds

        def ok(name):
            return name in self.available

        if lc == LatencyClass.STRICT and ok("fast_mamba_vsr"):
            return "fast_mamba_vsr"
        if (deg["unknown"] > thr.unknown_degradation and allow_zero_shot
                and ok("ditvr")):
            return "ditvr"
        if ((deg["compression"] > thr.compression
             or deg["motion_blur"] > thr.motion_blur + 0.1)
                and allow_diffusion and ok("seedvr2")):
            return "seedvr2"
        if content["motion_complexity"] > thr.motion_complexity and ok("vsrm"):
            return "vsrm"
        # Strict latency prefers the half-trunk Real-ESRGAN preset
        # (policy realesrgan_fast, round-4 verdict item 5).
        chain = (("fast_mamba_vsr", "realesrgan_fast", "realesrgan",
                  "cnn_upscaler", "bicubic")
                 if lc == LatencyClass.STRICT else
                 ("vsrm", "fast_mamba_vsr", "realesrgan", "cnn_upscaler",
                  "bicubic"))
        for cand in chain:
            if ok(cand):
                return cand
        return "bicubic"

    def _build_plan(self, primary, deg, content, lc, face, hfr):
        thr = self.policy.thresholds
        entry = self.policy.models.get(primary)
        budget = self.policy.budget(lc)

        experts = {
            "denoise": deg["noise"] > thr.noise,
            "compression_cleanup": deg["compression"] > thr.compression,
            "low_light": deg["low_light"] > thr.low_light,
            "face_restoration": bool(
                face and content["face_prominence"] > thr.face_prominence
            ),
            "temporal_smoothing": deg["temporal_inconsistency"] > 0.5,
            "hfr_interpolation": bool(hfr),
        }

        # Processing order (reference degradation_router.py:520-553):
        # cleanup -> primary model -> face -> temporal consistency -> hfr.
        order = []
        if experts["denoise"] or experts["compression_cleanup"] \
                or experts["low_light"]:
            order.append("preprocessing")
        order.append(f"sota_{primary}")
        if experts["face_restoration"]:
            order.append("face_restoration")
        if experts["temporal_smoothing"]:
            order.append("temporal_consistency")
        if experts["hfr_interpolation"]:
            order.append("hfr_interpolation")

        return {
            "degradations": deg,
            "content_analysis": content,
            "expert_routing": {
                "primary_model": primary,
                "model_config": {
                    "window": entry.window if entry else 8,
                    "stride": entry.stride if entry else 6,
                    "tile": entry.tile if entry else 512,
                    "tile_overlap": entry.tile_overlap if entry else 32,
                    "scale": entry.scale if entry else 2,
                },
                "experts": experts,
                "latency_class": lc.value,
                "budget": {
                    "max_ms_per_frame": budget.max_ms_per_frame,
                    "max_memory_gb": budget.max_memory_gb,
                },
            },
            "processing_order": order,
        }

    def _confidence(self, deg, content) -> float:
        """Confidence in the routing decision (reference
        degradation_router.py:595-613): high when scores are decisive."""
        known = [deg["compression"], deg["motion_blur"], deg["noise"],
                 deg["low_light"]]
        spread = max(known) - min(known)
        frames_factor = min(content["frame_count"] / 24.0, 1.0)
        return float(np.clip(0.5 + 0.4 * spread + 0.1 * frames_factor, 0.0, 1.0))

    def _fallback_plan(self, error: str) -> dict:
        """Hardcoded safe plan (reference degradation_router.py:615-655)."""
        return {
            "degradations": {k: 0.0 for k in
                             ("compression", "motion_blur", "low_light",
                              "noise", "temporal_inconsistency", "unknown")},
            "content_analysis": {"error": error},
            "expert_routing": {
                "primary_model": "cnn_upscaler"
                if "cnn_upscaler" in self.available else "bicubic",
                "model_config": {"window": 8, "stride": 8, "tile": 512,
                                 "tile_overlap": 32, "scale": 2},
                "experts": {},
                "latency_class": LatencyClass.STANDARD.value,
            },
            "processing_order": ["sota_cnn_upscaler"],
            "confidence_score": 0.0,
            "fallback": True,
        }
