"""Handler for the CNN-2x / bicubic basic path — the minimum e2e slice.

Public surface mirrors the reference handler contract: ``enhance_video(
input_path, output_path, ...) -> stats dict`` (reference vsrm_handler.py:470-476
signature family; the basic path itself is reference app.py:417-563).

Pipeline: background decode thread -> device batches -> jitted forward ->
host fetch -> encode. Static shapes per video resolution (one compile per
resolution+batch size).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..io.pipeline import FramePipeline
from ..io.video import VideoWriter, get_video_metadata
from ..models import upscaler
from ..utils.perf import track_enhancement_performance

__all__ = ["CnnUpscalerHandler"]


class CnnUpscalerHandler:
    def __init__(self, scale: int = 2, features: int = 128, depth: int = 3,
                 s2d: int = 4, seed: int = 0, use_cnn: bool = True,
                 weights_path: str | None = None,
                 compute_dtype=jnp.bfloat16):
        self.scale = scale
        self.use_cnn = use_cnn
        self.compute_dtype = compute_dtype
        if use_cnn:
            self.params, self.meta = upscaler.init(
                jax.random.PRNGKey(seed), features=features, scale=scale,
                depth=depth, s2d=s2d,
            )
            if weights_path:
                from .weights import try_load_params

                loaded = try_load_params(weights_path, self.params)
                if loaded is not None:
                    self.params = loaded
                    self.meta = dict(self.meta, weights="loaded")
            self.params = jax.tree.map(
                lambda a: a.astype(compute_dtype), self.params
            )
            from .calibration import calibrate_vsr

            raw = calibrate_vsr(
                "cnn_upscaler",
                lambda p, x: upscaler.apply(p, x, scale=scale, s2d=s2d))
            self._fwd = jax.jit(
                lambda p, x: raw(p, x.astype(compute_dtype))
                .astype(jnp.float32)
            )
        else:
            self.params = None
            self._fwd = jax.jit(
                lambda p, x: upscaler.bicubic_upscale(x, scale=scale)
            )

    def enhance_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        """frames (B, H, W, 3) float32 [0,1] -> upscaled float32."""
        return self._fwd(self.params, frames)

    @track_enhancement_performance("cnn_upscaler")
    def enhance_video(self, input_path, output_path, batch_size: int = 8,
                      fetch_group: int = 16, progress_cb=None) -> dict:
        t0 = time.time()
        meta = get_video_metadata(input_path)
        out_h, out_w = meta.height * self.scale, meta.width * self.scale
        pipe = FramePipeline(input_path, window=batch_size, stride=batch_size)
        frames_done = 0
        # Host fetches through the TPU tunnel have ~seconds of fixed latency,
        # so dispatch asynchronously and fetch in large groups: compute of
        # batch N overlaps the (rare) fetch of batches N-k..N-1.
        pending: list[tuple[jnp.ndarray, int]] = []
        with VideoWriter(output_path, (out_h, out_w), fps=meta.fps) as vw:

            def drain():
                nonlocal frames_done
                if not pending:
                    return
                arrays = jax.device_get([p[0] for p in pending])
                for arr, (_, valid) in zip(arrays, pending):
                    out_np = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
                    for i in range(valid):
                        vw.write(out_np[i])
                    frames_done += valid
                pending.clear()
                if progress_cb:
                    progress_cb(frames_done, meta.frame_count)

            for item in pipe:
                pending.append((self.enhance_frames(item["frames"]), item["valid"]))
                if len(pending) >= fetch_group:
                    drain()
            drain()
        dt = time.time() - t0
        return {
            "status": "success",
            "model": "cnn_upscaler" if self.use_cnn else "bicubic",
            "frames_processed": frames_done,
            "processing_time_sec": dt,
            "fps": frames_done / dt if dt > 0 else 0.0,
            "input_resolution": [meta.height, meta.width],
            "output_resolution": [out_h, out_w],
            "scale": self.scale,
            "output_path": str(output_path),
        }
