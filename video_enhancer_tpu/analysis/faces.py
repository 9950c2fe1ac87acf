"""Face detection with graceful degradation.

The reference chains MediaPipe -> face_recognition -> Haar -> MTCNN with
first-hit priority (reference face_restoration_expert.py:490-577). None of
those exist in this image (OpenCV 5 removed Haar cascades; no model
downloads). Detector chain here:

1. ``cv2.FaceDetectorYN`` if an ONNX model is provided via
   ``FACE_DETECTOR_ONNX`` (the modern OpenCV detector);
2. the bundled neural detector (analysis/face_net.py — CenterNet-style
   center-heatmap net trained on procedural synthetic scenes,
   train/face_detector.py) when ``weights/face_detector.npz`` exists;
3. a self-contained skin-tone blob heuristic (YCrCb skin mask ->
   connected components -> aspect/size filters) — crude but dependency-free.

Returns boxes as ``(x, y, w, h)`` ints.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["detect_faces", "face_area_ratio", "face_chain_trusted"]

_yn = None
_yn_failed = False


def _yn_detector(size_wh):
    global _yn, _yn_failed
    if _yn_failed:
        return None
    import cv2

    model = os.environ.get("FACE_DETECTOR_ONNX")
    if not model or not os.path.exists(model) or \
            not hasattr(cv2, "FaceDetectorYN_create"):
        _yn_failed = True
        return None
    try:
        if _yn is None:
            _yn = cv2.FaceDetectorYN_create(model, "", size_wh)
        _yn.setInputSize(size_wh)
        return _yn
    except Exception:
        _yn_failed = True
        return None


_nn = None
_nn_failed = False


def _nn_detector():
    """Lazy (params, jitted forward) for the bundled neural detector."""
    global _nn, _nn_failed
    if _nn_failed:
        return None
    if _nn is None:
        import pathlib

        path = (pathlib.Path(__file__).resolve().parents[1]
                / "weights" / "face_detector.npz")
        if not path.exists():
            _nn_failed = True
            return None
        try:
            import jax

            from ..runtime.weights import try_load_params
            from . import face_net

            params = face_net.init(jax.random.PRNGKey(0))
            loaded = try_load_params(path, params)
            if loaded is None:
                _nn_failed = True
                return None
            _nn = (loaded, jax.jit(face_net.apply))
        except Exception:
            _nn_failed = True
            return None
    return _nn


def _nn_faces(frame: np.ndarray) -> list[tuple[int, int, int, int]] | None:
    det = _nn_detector()
    if det is None:
        return None
    from . import face_net

    params, fwd = det
    try:
        return face_net.detect(params, frame, forward=fwd)
    except Exception:
        return None


def _skin_blob_faces(frame: np.ndarray) -> list[tuple[int, int, int, int]]:
    import cv2

    h, w = frame.shape[:2]
    ycrcb = cv2.cvtColor(frame, cv2.COLOR_RGB2YCrCb)
    y, cr, cb = ycrcb[..., 0], ycrcb[..., 1], ycrcb[..., 2]
    # Classic YCrCb skin window (Chai & Ngan).
    mask = ((cr > 133) & (cr < 173) & (cb > 77) & (cb < 127) & (y > 40)
            ).astype(np.uint8) * 255
    mask = cv2.morphologyEx(
        mask, cv2.MORPH_CLOSE, np.ones((5, 5), np.uint8), iterations=2
    )
    n, labels, stats, _ = cv2.connectedComponentsWithStats(mask)
    boxes = []
    min_area = max((h * w) // 400, 36)
    for i in range(1, n):
        x, y0, bw, bh, area = stats[i]
        if area < min_area:
            continue
        aspect = bw / max(bh, 1)
        fill = area / max(bw * bh, 1)
        if 0.4 <= aspect <= 1.6 and fill > 0.4:
            boxes.append((int(x), int(y0), int(bw), int(bh)))
    return boxes


def detect_faces(frame: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Detect faces in an RGB uint8 frame; first-hit detector chain."""
    h, w = frame.shape[:2]
    det = _yn_detector((w, h))
    if det is not None:
        import cv2

        try:
            _, faces = det.detect(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            if faces is not None and len(faces):
                return [tuple(int(v) for v in f[:4]) for f in faces]
            # Zero faces -> consult the next tier (reference semantics).
        except Exception:
            pass
    nn_boxes = _nn_faces(frame)
    if nn_boxes:
        return nn_boxes
    # Empty = "no detection", NOT "no faces": the net runs on a 128x128
    # downscale where small faces in HD frames vanish, so (like the
    # reference chain, face_restoration_expert.py:521,538, which only
    # stops at the first detector that FINDS something) fall through to
    # the skin-blob heuristic rather than silently reporting zero faces.
    return _skin_blob_faces(frame)


def face_area_ratio(frames: np.ndarray, max_samples: int = 4) -> float:
    """Mean face-area ratio over sampled frames (router's face prominence,
    reference degradation_router.py:310-320)."""
    step = max(len(frames) // max_samples, 1)
    ratios = []
    for f in frames[::step]:
        area = sum(w * h for (_, _, w, h) in detect_faces(f))
        ratios.append(area / (f.shape[0] * f.shape[1]))
    return float(np.mean(ratios)) if ratios else 0.0


_TRUST_FLOOR = 0.5
_trust_cache: dict = {}


def face_chain_trusted(floor: float = _TRUST_FLOOR) -> bool:
    """Whether the detector chain's committed validity report clears the
    trust floor (worst-stratum recall >= ``floor``).

    The report (docs/FACE_VALIDITY.json, scripts/face_validity.py) is the
    measured claim boundary of the synthetic-trained detector. Missing
    report = not trusted (conservative: face routing then requires an
    explicit opt-in). An external YuNet detector (FACE_DETECTOR_ONNX) is
    always trusted — it is a pretrained real-world detector."""
    if os.environ.get("FACE_DETECTOR_ONNX") and not _yn_failed:
        return True
    if "min_recall" not in _trust_cache:
        import json
        import pathlib

        path = (pathlib.Path(__file__).resolve().parents[2]
                / "docs" / "FACE_VALIDITY.json")
        try:
            _trust_cache["min_recall"] = float(
                json.loads(path.read_text())["chain_min_recall"])
        except Exception:
            _trust_cache["min_recall"] = -1.0
    return _trust_cache["min_recall"] >= floor
