"""Generic VSR handler: temporal chunking + spatial tiling around any
(B, T, H, W, 3) -> (B, T, sH, sW, 3) jitted model.

Re-creates the shared shape of all four reference handlers (sliding windows
reference vsrm_handler.py:511-547, chunking fast_mamba_vsr_handler.py:560-673,
tiling vsrm_handler.py:623-664 / fast_mamba_vsr_handler.py:728-793) once,
instead of four copies:

- temporal chunks of ``chunk`` frames with ``overlap`` overlap; interior
  overlap frames are taken from the later chunk (fresh temporal context);
- spatial tiles with overlap-add ramp blending (ops/blend.py) when frames
  exceed ``tile``;
- all shapes static: tail chunks/tiles are padded (edge frames repeated,
  reference ditvr_handler.py:797-801) so one compilation serves the video;
- asynchronous dispatch with grouped host fetches (the TPU tunnel costs
  ~2 s per fetch in this environment).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..io.pipeline import FramePipeline
from ..io.video import VideoWriter, get_video_metadata
from ..utils.perf import get_tracker

__all__ = ["VSRHandler"]


class VSRHandler:
    """Wraps a jitted clip model with streaming video processing."""

    def __init__(
        self,
        name: str,
        apply_fn: Callable,          # (params, clip(B,T,H,W,3), **ctx) -> clip
        params,
        scale: int = 4,
        chunk: int = 8,
        overlap: int = 2,
        tile: int = 512,
        tile_overlap: int = 32,
        compute_dtype=jnp.bfloat16,
        context: dict | None = None,
        quality_threshold: float | None = None,
        mesh=None,
    ):
        self.name = name
        self.scale = scale
        self.chunk = chunk
        self.overlap = overlap
        self.tile = tile
        self.tile_overlap = tile_overlap
        self.compute_dtype = compute_dtype
        # Quality gating (reference seedvr2_handler.py:506-550): windows whose
        # sharpness already exceeds the threshold skip the model entirely.
        # Only scale-1 restorers support it (a gated VSR window would have
        # to emit an upscaled frame from nothing) — matching the reference,
        # which gates SeedVR2 only. The limitation is surfaced in
        # /api/v1/strategies as "quality_gating" rather than no-op'ing
        # silently.
        self.gating_supported = scale == 1
        self.quality_threshold = quality_threshold if scale == 1 else None
        if quality_threshold is not None and not self.gating_supported:
            import logging

            logging.getLogger(__name__).warning(
                "%s: quality_threshold ignored (scale=%d model; gating is "
                "restoration-only)", name, scale)
        self.params = jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )
        # Context: per-video conditioning (e.g. DiTVR's degradation scores)
        # passed as traced arrays so updates don't trigger recompiles.
        self.context = {k: jnp.asarray(v) for k, v in (context or {}).items()}
        self._fwd = jax.jit(
            lambda p, x, ctx: apply_fn(p, x.astype(compute_dtype), **ctx)
            .astype(jnp.float32)
        )
        # Optional SPMD inference over a device mesh (T frame-halos, H
        # row-halos — the distributed form of chunk/tile overlap).
        self.mesh = mesh
        self._sharded = None
        if mesh is not None and mesh.devices.size > 1:
            from ..parallel.inference import make_mesh_sharded_clip_fn

            self._sharded = make_mesh_sharded_clip_fn(
                lambda p, x: apply_fn(p, x.astype(compute_dtype),
                                      **self.context).astype(jnp.float32),
                mesh, halo_t=max(overlap, 1), halo_s=8, scale=scale,
            )

    def update_context(self, **kw) -> None:
        for k, v in kw.items():
            if k in self.context:
                self.context[k] = jnp.asarray(
                    v, self.context[k].dtype
                ).reshape(self.context[k].shape)

    # -- core clip processing ---------------------------------------------
    def process_clip(self, clip: jnp.ndarray) -> jnp.ndarray:
        """(T, H, W, 3) float32 -> (T, sH, sW, 3) float32, tiling if large."""
        t, h, w, _ = clip.shape
        if self._sharded is not None:
            n_t = self.mesh.shape.get("time", 1)
            n_s = self.mesh.shape.get("space", 1)
            divisible = (t % n_t == 0 and h % n_s == 0
                         and (n_t == 1 or t // n_t >= max(self.overlap, 1))
                         and (n_s == 1 or h // n_s >= 8))
            if divisible:
                return self._sharded(self.params, clip[None])[0]
        if max(h, w) <= self.tile:
            return self._fwd(self.params, clip[None], self.context)[0]
        return self._tiled(clip)

    def _tiled(self, clip: jnp.ndarray) -> jnp.ndarray:
        from ..ops.blend import overlap_add_blend

        t, h, w, _ = clip.shape
        ts, ov = self.tile, self.tile_overlap
        step = ts - ov
        ys = list(range(0, max(h - ov, 1), step))
        xs = list(range(0, max(w - ov, 1), step))
        # Clamp final tiles inside the frame (keeps tile shapes static).
        ys = sorted({min(y, max(h - ts, 0)) for y in ys})
        xs = sorted({min(x, max(w - ts, 0)) for x in xs})
        # Batch tiles through the forward in fixed-size groups (the reference
        # loops tiles through separate forwards, vsrm_handler.py:623-664);
        # batching keeps the MXU fed, the fixed group size keeps one
        # compilation and bounds activation memory.
        tile_stack, origins = [], []
        for y in ys:
            for x in xs:
                tile_stack.append(clip[:, y:y + ts, x:x + ts, :])
                origins.append((y * self.scale, x * self.scale))
        s = self.scale
        group = 4
        outs = []
        for i in range(0, len(tile_stack), group):
            batch = tile_stack[i:i + group]
            n_valid = len(batch)
            while len(batch) < group and len(tile_stack) > group:
                batch.append(batch[-1])  # pad to keep the shape static
            out = self._fwd(self.params, jnp.stack(batch), self.context)
            outs.append(out[:n_valid])
        stacked = jnp.concatenate(outs, axis=0)        # (N, T, sts, sts, 3)
        per_frame = jnp.swapaxes(stacked, 0, 1)        # (T, N, sts, sts, 3)
        blend = jax.vmap(
            lambda ft: overlap_add_blend(
                ft, jnp.asarray(origins), (h * s, w * s), ov * s
            )
        )
        return blend(per_frame)

    @staticmethod
    def _window_quality(frames) -> float:
        """Normalized Laplacian-variance sharpness of a window (the
        reference's per-window quality score, seedvr2_handler.py:506-550)."""
        import cv2

        arr = np.asarray(frames)
        mid = arr[arr.shape[0] // 2]
        gray = cv2.cvtColor((mid * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
        var = cv2.Laplacian(gray, cv2.CV_32F).var()
        return float(min(var / 500.0, 1.0))

    # -- video file processing --------------------------------------------
    def enhance_video(self, input_path, output_path,
                      fetch_group: int = 4, progress_cb=None) -> dict:
        tracker = get_tracker()
        op = tracker.start_operation("enhance_video", self.name,
                                     input=str(input_path))
        t0 = time.time()
        try:
            meta = get_video_metadata(input_path)
            s = self.scale
            out_hw = (meta.height * s, meta.width * s)
            stride = self.chunk - self.overlap
            pipe = FramePipeline(input_path, window=self.chunk, stride=stride)
            frames_done = 0
            pending: list[tuple] = []
            with VideoWriter(output_path, out_hw, fps=meta.fps) as vw:

                def drain():
                    nonlocal frames_done
                    if not pending:
                        return
                    arrays = jax.device_get([p[0] for p in pending])
                    for arr, (_, start, valid) in zip(arrays, pending):
                        # Skip overlap frames already written by the previous
                        # chunk (fresh-context rule: later chunk wins tail).
                        begin = self.overlap if start > 0 else 0
                        end = min(valid, self.chunk)
                        for i in range(begin, end):
                            if start + i < meta.frame_count:
                                f = np.clip(
                                    np.round(arr[i] * 255.0), 0, 255
                                ).astype(np.uint8)
                                vw.write(f)
                                frames_done += 1
                    pending.clear()
                    if progress_cb:
                        progress_cb(frames_done, meta.frame_count)

                windows_skipped = 0
                for item in pipe:
                    if self.quality_threshold is not None and \
                            self._window_quality(item["frames"]) \
                            > self.quality_threshold:
                        # Window already sharp: pass through untouched
                        # (reference seedvr2_handler.py:517-527).
                        out = item["frames"]
                        windows_skipped += 1
                    else:
                        out = self.process_clip(item["frames"])
                    pending.append((out, item["start"], item["valid"]))
                    if len(pending) >= fetch_group:
                        drain()
                drain()
            dt = time.time() - t0
            stats = {
                "status": "success",
                "model": self.name,
                "frames_processed": frames_done,
                "processing_time_sec": dt,
                "fps": frames_done / dt if dt > 0 else 0.0,
                "input_resolution": [meta.height, meta.width],
                "output_resolution": list(out_hw),
                "scale": s,
                "chunk": self.chunk,
                "windows_skipped": windows_skipped,
                "overlap": self.overlap,
                "output_path": str(output_path),
            }
            tracker.update_operation(op, frames_done=frames_done)
            tracker.finish_operation(op, success=True)
            return stats
        except Exception as e:
            tracker.finish_operation(op, success=False, error=str(e))
            raise
