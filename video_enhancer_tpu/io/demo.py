"""Synthetic demo/test video generator.

Mirrors the reference's animated demo (reference app.py:1487-1576,
utils/create_demo_video.py): moving shapes, gradient background, frame
counter — deterministic, so golden-output tests are reproducible.
"""

from __future__ import annotations

import numpy as np

from .video import write_video

__all__ = ["make_demo_frames", "write_demo_video"]


def make_demo_frames(frames: int = 48, size_hw: tuple[int, int] = (240, 320),
                     seed: int = 0) -> np.ndarray:
    import cv2

    h, w = size_hw
    rng = np.random.default_rng(seed)
    base_noise = rng.integers(0, 12, (h, w, 3), dtype=np.uint8)
    out = np.empty((frames, h, w, 3), np.uint8)
    yy = np.linspace(0, 1, h)[:, None]
    xx = np.linspace(0, 1, w)[None, :]
    for t in range(frames):
        ph = 2 * np.pi * t / max(frames, 1)
        grad = np.stack(
            [
                (120 + 100 * yy * np.cos(ph)) * np.ones_like(xx),
                (90 + 80 * xx) * np.ones_like(yy),
                60 + 50 * (xx + yy) / 2,
            ],
            axis=-1,
        ).astype(np.uint8)
        img = cv2.add(grad, base_noise)
        cx = int(w * (0.5 + 0.35 * np.cos(ph)))
        cy = int(h * (0.5 + 0.35 * np.sin(ph)))
        cv2.circle(img, (cx, cy), max(h // 12, 4), (250, 220, 90), -1)
        cv2.rectangle(
            img,
            (int(w * 0.1), int(h * 0.7)),
            (int(w * 0.1) + 30 + t % 20, int(h * 0.7) + 24),
            (80, 200, 240),
            -1,
        )
        cv2.putText(img, f"frame {t:03d}", (8, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 255), 1)
        out[t] = img
    return out


def write_demo_video(path, frames: int = 48, size_hw: tuple[int, int] = (240, 320),
                     fps: float = 24.0, seed: int = 0) -> str:
    return write_video(path, make_demo_frames(frames, size_hw, seed), fps=fps)
