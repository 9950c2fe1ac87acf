"""Video decode/encode via OpenCV (no ffmpeg binary in this environment).

Replaces the reference's ffprobe-subprocess metadata + cv2 loops
(reference utils/video_utils.py:38-135, vsrm_handler.py:504-539). Frames are
RGB uint8 ``(H, W, 3)`` throughout the framework; BGR exists only inside this
module. Also provides ``sample_frames`` — which the reference's tests call but
its VideoUtils never implemented (reference tests/test_smoke_e2e.py:186).
"""

from __future__ import annotations

import dataclasses
import os
import pathlib

import cv2
import numpy as np

__all__ = [
    "VideoMetadata",
    "get_video_metadata",
    "read_video",
    "sample_frames",
    "write_video",
    "VideoReader",
    "VideoWriter",
]


@dataclasses.dataclass(frozen=True)
class VideoMetadata:
    path: str
    width: int
    height: int
    fps: float
    frame_count: int
    duration_sec: float
    codec: str = ""

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def _open(path) -> cv2.VideoCapture:
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    return cap


def get_video_metadata(path) -> VideoMetadata:
    cap = _open(path)
    try:
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        fourcc = int(cap.get(cv2.CAP_PROP_FOURCC))
        codec = "".join(chr((fourcc >> (8 * i)) & 0xFF) for i in range(4)).strip()
        return VideoMetadata(
            path=str(path), width=w, height=h, fps=float(fps),
            frame_count=n, duration_sec=(n / fps if fps else 0.0), codec=codec,
        )
    finally:
        cap.release()


def read_video(path, start: int = 0, count: int | None = None) -> np.ndarray:
    """Read frames as ``(T, H, W, 3)`` RGB uint8."""
    cap = _open(path)
    try:
        if start:
            cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        frames = []
        while count is None or len(frames) < count:
            ok, bgr = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        if not frames:
            raise IOError(f"no frames read from {path}")
        return np.stack(frames)
    finally:
        cap.release()


def sample_frames(path, num_samples: int = 12) -> np.ndarray:
    """Uniformly sample frames (router analysis; reference
    degradation_router.py:555-593 seeks 12 uniform positions)."""
    meta = get_video_metadata(path)
    n = max(meta.frame_count, 1)
    idxs = np.unique(np.linspace(0, n - 1, num_samples).astype(int))
    cap = _open(path)
    try:
        out = []
        for i in idxs:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
            ok, bgr = cap.read()
            if ok:
                out.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        if not out:
            raise IOError(f"no frames sampled from {path}")
        return np.stack(out)
    finally:
        cap.release()


def write_video(path, frames: np.ndarray, fps: float = 30.0,
                codec: str = "mp4v") -> str:
    """Write ``(T, H, W, 3)`` RGB uint8 frames."""
    path = str(path)
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    t, h, w, _ = frames.shape
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*codec), fps, (w, h))
    if not vw.isOpened():
        raise IOError(f"cannot open writer: {path}")
    try:
        for f in frames:
            vw.write(cv2.cvtColor(np.ascontiguousarray(f), cv2.COLOR_RGB2BGR))
    finally:
        vw.release()
    if not os.path.getsize(path):
        raise IOError(f"writer produced empty file: {path}")
    return path


class VideoReader:
    """Streaming frame reader with window/batch helpers."""

    def __init__(self, path):
        self.meta = get_video_metadata(path)
        self._cap = _open(path)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        ok, bgr = self._cap.read()
        if not ok:
            self._cap.release()
            raise StopIteration
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)

    def close(self):
        self._cap.release()


class VideoWriter:
    """Streaming RGB frame writer."""

    def __init__(self, path, size_hw: tuple[int, int], fps: float = 30.0,
                 codec: str = "mp4v"):
        h, w = size_hw
        pathlib.Path(str(path)).parent.mkdir(parents=True, exist_ok=True)
        self._vw = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*codec), fps, (w, h)
        )
        if not self._vw.isOpened():
            raise IOError(f"cannot open writer: {path}")
        self.path = str(path)
        self.frames_written = 0

    def write(self, frame: np.ndarray):
        self._vw.write(cv2.cvtColor(np.ascontiguousarray(frame), cv2.COLOR_RGB2BGR))
        self.frames_written += 1

    def close(self):
        self._vw.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
