"""Frame-interpolation handler (reference models/interpolation/
rife_handler.py:334-451 + enhanced_rife_handler.py:220-321).

Supports integer interpolation factors (2x = midpoints, 4x = recursive) and
``target_fps``; falls back to cv2-style frame blending if the model fails
(reference enhanced_rife_handler.py:187-193).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..io.video import VideoWriter, get_video_metadata, read_video
from ..models import rife
from ..utils.perf import track_enhancement_performance

__all__ = ["RIFEHandler"]


class RIFEHandler:
    def __init__(self, dim: int = 32, levels: int = 3, seed: int = 0,
                 compute_dtype=jnp.bfloat16, weights_path=None,
                 official_ckpt=None, official_c: int = 90):
        import os
        import pathlib

        from .weights import try_load_params

        # Official released checkpoint (the reference clones and loads
        # hzwer's flownet.pkl, enhanced_rife_handler.py:61-111): an
        # IFNet_HDv3 .pth/.pkl converts through the structurally-proven
        # path (models/official_arch.py ifnet_official_*) and serves the
        # published graph; zero egress = the file must be provided
        # (arg or VETPU_RIFE_CKPT).
        interp_fn = rife.interpolate_pair
        self.params = None
        ckpt = official_ckpt or os.environ.get("VETPU_RIFE_CKPT")
        if ckpt and pathlib.Path(ckpt).exists():
            from ..models.official_arch import (ifnet_official_apply,
                                                ifnet_official_init)

            template = ifnet_official_init(jax.random.PRNGKey(0),
                                           c=official_c)
            loaded = try_load_params(ckpt, template)
            if loaded is not None:
                self.params = loaded
                self.meta = {"official": True, "weights": str(ckpt)}
                interp_fn = ifnet_official_apply
        if self.params is None:
            self.params, self.meta = rife.init(jax.random.PRNGKey(seed),
                                               dim=dim, levels=levels)
            # Weight chain: explicit path -> bundled npz -> random init.
            candidates = [weights_path] if weights_path else []
            candidates.append(pathlib.Path(__file__).resolve().parents[1]
                              / "weights" / "rife.npz")
            for cand in candidates:
                if cand and pathlib.Path(cand).exists():
                    loaded = try_load_params(cand, self.params)
                    if loaded is not None:
                        self.params = loaded
                        self.meta = dict(self.meta, weights=str(cand))
                        break
        self.params = jax.tree.map(
            lambda a: a.astype(compute_dtype), self.params
        )
        self.compute_dtype = compute_dtype
        if not self.meta.get("official"):
            # Calibrated strength covers the bundled synthetic-trained
            # weights only (runtime/calibration.py); a provided released
            # IFNet checkpoint serves at full strength.
            from .calibration import calibrate_interp

            interp_fn = calibrate_interp("rife", interp_fn)
        self._mid = jax.jit(
            lambda p, a, b: interp_fn(
                p, a.astype(compute_dtype), b.astype(compute_dtype)
            ).astype(jnp.float32)
        )

    def interpolate_pair(self, f0: np.ndarray, f1: np.ndarray) -> np.ndarray:
        out = self._mid(self.params, jnp.asarray(f0)[None],
                        jnp.asarray(f1)[None])
        return np.asarray(out[0])

    @track_enhancement_performance("rife")
    def interpolate_video(self, input_path, output_path,
                          interpolation_factor: int = 2,
                          target_fps: float | None = None,
                          quality: str = "balanced") -> dict:
        """``quality="high"`` enables multi-scale midpoint estimation
        (reference EnhancedRIFE's high mode blends flow estimates across
        scales, enhanced_rife_handler.py quality tiers)."""
        t0 = time.time()
        meta = get_video_metadata(input_path)
        if target_fps:
            interpolation_factor = max(
                int(round(target_fps / max(meta.fps, 1.0))), 1
            )
        frames = read_video(input_path).astype(np.float32) / 255.0
        levels = max(int(np.log2(max(interpolation_factor, 1))), 0)

        clip = frames
        for _ in range(levels):
            clip = self._double(clip, multiscale=quality == "high")

        out_fps = meta.fps * (2 ** levels)
        out_u8 = np.clip(np.round(clip * 255.0), 0, 255).astype(np.uint8)
        with VideoWriter(output_path, clip.shape[1:3], fps=out_fps) as vw:
            for f in out_u8:
                vw.write(f)
        dt = time.time() - t0
        return {
            "status": "success",
            "model": "rife",
            "frames_in": int(frames.shape[0]),
            "frames_processed": int(clip.shape[0]),
            "input_fps": meta.fps,
            "output_fps": out_fps,
            "interpolation_factor": 2 ** levels,
            "processing_time_sec": dt,
            "output_path": str(output_path),
        }

    def _double(self, clip: np.ndarray, multiscale: bool = False
                ) -> np.ndarray:
        t = clip.shape[0]
        if t < 2:
            return clip
        try:
            mids = []
            for i in range(t - 1):
                f0 = jnp.asarray(clip[i])[None]
                f1 = jnp.asarray(clip[i + 1])[None]
                mid = self._mid(self.params, f0, f1)
                if multiscale:
                    # High-quality mode: blend with a half-resolution
                    # estimate (coarse motion dominates where the full-res
                    # flow aliases).
                    import jax

                    h, w = clip.shape[1] // 2 * 2, clip.shape[2] // 2 * 2
                    small = lambda z: jax.image.resize(
                        z[:, :h, :w], (1, h // 2, w // 2, 3), "linear")
                    mid_lo = self._mid(self.params, small(f0), small(f1))
                    mid_lo = jax.image.resize(
                        mid_lo, (1,) + clip.shape[1:3] + (3,), "linear")
                    mid = 0.75 * mid + 0.25 * mid_lo
                mids.append(mid[0])
            mids = np.asarray(jnp.stack(mids))
        except Exception:
            # Blend fallback (reference enhanced_rife_handler.py:187-193).
            mids = 0.5 * clip[:-1] + 0.5 * clip[1:]
        out = np.empty((2 * t - 1, *clip.shape[1:]), clip.dtype)
        out[0::2] = clip
        out[1::2] = mids
        return out
