"""QualityAssessmentAgent (reference agents/quality_assessor/quality_agent.py).

Device-side quality metrics over output/reference clips: PSNR/SSIM/MSE/MAE
(reference quality_agent.py:274-318), temporal consistency (:450-471),
flicker via brightness variance (:473-493), detail preservation (:495-541),
artifact score (:543-582), color accuracy (:584-605); category table
(:78-83), reprocess decision + recommendations (:621-673) and an overall
weighted score (:691-713). The VGG/LPIPS perceptual path is approximated by
a fixed random-feature perceptual distance (no torchvision weights in this
environment) with the same interface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.metrics import psnr, ssim
from .base import AgentCapabilities, BaseAgent, ProcessingResult
from .task_spec import TaskSpecification, TaskType

__all__ = ["QualityAssessmentAgent", "assess_clips"]

# excellent/good/acceptable/poor thresholds (reference quality_agent.py:79-83)
CATEGORIES = (
    ("excellent", 35.0, 0.95),
    ("good", 30.0, 0.90),
    ("acceptable", 25.0, 0.80),
    ("poor", 20.0, 0.70),
)


def _fixed_features(key, cin=3, cout=16):
    return jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.2


_FEAT_W = None
_CALIBRATED = None  # trained feature-net params, or False if unavailable


def _load_calibrated():
    """Distortion-ranking-calibrated metric (train/lpips.py; bundled npz).
    Held-out Spearman vs PSNR quality ordering is asserted in tests —
    unlike the reference's VGG LPIPS this ships with its calibration
    (reference quality_agent.py:351-448 requires a torchvision download)."""
    global _CALIBRATED
    if _CALIBRATED is None:
        import pathlib

        from ..runtime.weights import try_load_params
        from ..train.lpips import feat_init

        npz = (pathlib.Path(__file__).resolve().parents[1] / "weights"
               / "lpips_proxy.npz")
        _CALIBRATED = False
        if npz.exists():
            loaded = try_load_params(
                npz, {"layers": feat_init(jax.random.PRNGKey(0))})
            if loaded is not None:
                _CALIBRATED = loaded["layers"]
    return _CALIBRATED


def _perceptual_distance(a, b):
    """Calibrated feature-net distance; random-projection fallback when the
    bundled weights are absent."""
    params = _load_calibrated()
    if params is not False:
        from ..train.lpips import lpips_distance

        return jnp.mean(lpips_distance(params, a, b))
    global _FEAT_W
    if _FEAT_W is None:
        _FEAT_W = _fixed_features(jax.random.PRNGKey(42))
    from jax import lax

    def feats(x):
        return lax.conv_general_dilated(
            x, _FEAT_W, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    fa, fb = feats(a), feats(b)
    return jnp.mean(jnp.abs(fa - fb))


@jax.jit
def assess_clips(out_clip: jnp.ndarray, ref_clip: jnp.ndarray) -> dict:
    """Full metric set over (T, H, W, 3) float32 clips in [0,1]."""
    diff = out_clip - ref_clip
    mse = jnp.mean(diff * diff)
    mae = jnp.mean(jnp.abs(diff))
    lum = jnp.mean(out_clip, axis=(1, 2, 3))
    flicker = jnp.std(lum[1:] - lum[:-1]) if out_clip.shape[0] > 1 \
        else jnp.zeros(())
    # Detail preservation: high-frequency energy ratio out/ref.
    def hf(x):
        blur = jax.vmap(
            lambda f: jax.image.resize(
                jax.image.resize(f, (f.shape[0] // 2, f.shape[1] // 2, 3),
                                 "linear"),
                f.shape, "linear",
            )
        )(x)
        return jnp.mean(jnp.abs(x - blur))
    detail = jnp.clip(hf(out_clip) / jnp.maximum(hf(ref_clip), 1e-6), 0.0, 2.0)
    # Artifact score: energy in out's high freq absent from ref.
    artifact = jnp.clip(hf(out_clip) - hf(ref_clip), 0.0, 1.0) * 10.0
    color = 1.0 - jnp.clip(
        jnp.mean(jnp.abs(jnp.mean(out_clip, axis=(0, 1, 2))
                         - jnp.mean(ref_clip, axis=(0, 1, 2)))) * 5.0,
        0.0, 1.0,
    )
    tc = 1.0 - (jnp.mean(jnp.abs(out_clip[1:] - out_clip[:-1]))
                if out_clip.shape[0] > 1 else jnp.zeros(()))
    return {
        "psnr": psnr(out_clip, ref_clip),
        "ssim": ssim(out_clip, ref_clip),
        "mse": mse,
        "mae": mae,
        "lpips_proxy": _perceptual_distance(out_clip, ref_clip),
        "temporal_consistency": tc,
        "flicker": flicker,
        "detail_preservation": detail,
        "artifact_score": artifact,
        "color_accuracy": color,
    }


class QualityAssessmentAgent(BaseAgent):
    def __init__(self, agent_id: str = "quality_assessor", policy=None):
        super().__init__(
            agent_id,
            AgentCapabilities(task_types={TaskType.QUALITY_ASSESSMENT},
                              max_concurrent_tasks=4),
        )
        from ..config import default_policy

        self.policy = policy or default_policy()

    def _execute(self, task: TaskSpecification) -> ProcessingResult:
        from ..io.video import read_video
        from ..ops import resize

        out = jnp.asarray(read_video(task.output_path)).astype(jnp.float32) / 255.0
        ref = jnp.asarray(read_video(task.input_path)).astype(jnp.float32) / 255.0
        n = min(out.shape[0], ref.shape[0])
        out, ref = out[:n], ref[:n]
        if out.shape[1:3] != ref.shape[1:3]:
            ref = resize(ref, out.shape[1:3], method="cubic")
        metrics = {k: float(v) for k, v in assess_clips(out, ref).items()}
        metrics["category"] = self.categorize(metrics)
        metrics["overall_score"] = self.overall_score(metrics)
        metrics.update(self.reprocess_decision(metrics))
        return ProcessingResult(task_id=task.task_id, status="success",
                                metrics=metrics)

    @staticmethod
    def categorize(m: dict) -> str:
        for name, min_psnr, min_ssim in CATEGORIES:
            if m["psnr"] >= min_psnr and m["ssim"] >= min_ssim:
                return name
        return "unacceptable"

    @staticmethod
    def overall_score(m: dict) -> float:
        """Weighted 0..1 (reference quality_agent.py:691-713)."""
        psnr_n = min(max(m["psnr"] - 20.0, 0.0) / 20.0, 1.0)
        return float(np.clip(
            0.3 * psnr_n + 0.3 * m["ssim"]
            + 0.2 * m["temporal_consistency"]
            + 0.1 * min(m["detail_preservation"], 1.0)
            + 0.1 * m["color_accuracy"],
            0.0, 1.0,
        ))

    def reprocess_decision(self, m: dict) -> dict:
        """Quality gates + escalation (reference quality_agent.py:621-673,
        policy gates policy_v1.yaml:236-261 — loaded here for real)."""
        gates = self.policy.quality_gates
        failed = []
        if m["psnr"] < gates.min_psnr:
            failed.append(f"psnr {m['psnr']:.1f} < {gates.min_psnr}")
        if m["ssim"] < gates.min_ssim:
            failed.append(f"ssim {m['ssim']:.2f} < {gates.min_ssim}")
        recs = []
        if failed and gates.escalate_on_failure:
            recs.append("escalate to a higher-quality model (vsrm/seedvr2)")
        if m["flicker"] > 0.05:
            recs.append("enable temporal smoothing")
        if m["artifact_score"] > 0.5:
            recs.append("reduce sharpening / enable compression cleanup")
        return {
            "gates_failed": failed,
            "needs_reprocessing": bool(failed),
            "recommendations": recs,
        }
