"""Decode -> device feed pipeline with background prefetch.

The reference's hot loop decodes, converts and uploads synchronously inside
the model loop (reference vsrm_handler.py:518-539). Here decode runs on a
host thread filling a bounded queue while the TPU consumes batches —
``device_put`` of batch N+1 overlaps compute on batch N (double buffering).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import jax
import numpy as np

from .video import VideoReader

__all__ = ["FramePipeline"]

_SENTINEL = object()


class FramePipeline:
    """Iterate device-resident normalized frame windows from a video file.

    Yields ``(batch, meta)`` where batch is a jax array ``(T, H, W, 3)``
    float32 in [0, 1] (windowed with stride/overlap), prefetched ``depth``
    batches ahead.
    """

    def __init__(
        self,
        path,
        window: int = 8,
        stride: int | None = None,
        depth: int = 2,
        pad_mode: str = "edge",
        transform: Callable[[np.ndarray], np.ndarray] | None = None,
    ):
        self.reader = VideoReader(path)
        self.meta = self.reader.meta
        self.window = window
        self.stride = stride or window
        self.depth = depth
        self.pad_mode = pad_mode
        self.transform = transform
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            buf: list[np.ndarray] = []
            start_idx = 0
            for frame in self.reader:
                buf.append(frame)
                if len(buf) == self.window:
                    self._emit(buf, start_idx)
                    keep = self.window - self.stride
                    buf = buf[self.stride:] if keep > 0 else []
                    start_idx += self.stride
            if buf:
                # Pad the tail window by repeating the last frame (the
                # reference pads the same way, ditvr_handler.py:797-801).
                valid = len(buf)
                while len(buf) < self.window:
                    buf.append(buf[-1])
                self._emit(buf, start_idx, valid=valid)
        except BaseException as e:  # propagate into consumer
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def _emit(self, buf, start_idx, valid=None):
        arr = np.stack(buf).astype(np.float32) / 255.0
        if self.transform is not None:
            arr = self.transform(arr)
        batch = jax.device_put(arr)
        self._q.put(
            {
                "frames": batch,
                "start": start_idx,
                "valid": valid if valid is not None else self.window,
            }
        )

    def __iter__(self) -> Iterator[dict]:
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item
