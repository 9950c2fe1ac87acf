"""Neural face detector: targets, decode round-trip, bundled-weight quality,
and detector-chain integration (reference multi-detector chain,
face_restoration_expert.py:490-577)."""

import numpy as np
import pytest


def test_scene_generator_shapes_and_boxes():
    from video_enhancer_tpu.train.face_detector import make_face_scenes

    imgs, boxes = make_face_scenes(6, seed=3)
    assert imgs.shape == (6, 128, 128, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    for blist in boxes:
        for (x, y, w, h) in blist:
            assert 0 <= x < 128 and 0 <= y < 128
            assert w > 0 and h > 0
            assert x + w <= 128 + 2 and y + h <= 128 + 2


def test_encode_targets_peaks_and_mask():
    from video_enhancer_tpu.train.face_detector import encode_targets

    boxes = [[(32, 32, 32, 40)], []]
    heat, reg, mask = encode_targets(boxes, 2)
    assert heat.shape == (2, 16, 16) and reg.shape == (2, 16, 16, 4)
    # center of (32,32,32,40) is (48,52) -> grid cell (6,6) at stride 8
    assert heat[0, 6, 6] == 1.0
    assert mask[0].sum() == 1.0 and mask[1].sum() == 0.0
    assert np.isclose(np.exp(reg[0, 6, 6, 0]) * 8, 32)
    assert np.isclose(np.exp(reg[0, 6, 6, 1]) * 8, 40)


def test_decode_round_trip():
    from video_enhancer_tpu.analysis.face_net import decode

    out = np.full((16, 16, 5), -8.0, np.float32)
    # a confident face centered at (48+4, 52+2) with size (32, 40)
    out[6, 6, 0] = 8.0  # sigmoid ~ 1
    out[6, 6, 1] = np.log(32 / 8)
    out[6, 6, 2] = np.log(40 / 8)
    out[6, 6, 3] = 0.5
    out[6, 6, 4] = 0.25
    boxes = decode(out, threshold=0.35)
    assert len(boxes) == 1
    x, y, w, h, score = boxes[0]
    assert score > 0.99
    assert np.isclose(w, 32, atol=0.5) and np.isclose(h, 40, atol=0.5)
    assert np.isclose(x + w / 2, (6 + 0.5) * 8, atol=0.5)
    assert np.isclose(y + h / 2, (6 + 0.25) * 8, atol=0.5)


def test_bundled_detector_recall_precision():
    import pathlib

    weights = (pathlib.Path(__file__).resolve().parents[1]
               / "video_enhancer_tpu" / "weights" / "face_detector.npz")
    if not weights.exists():
        pytest.skip("face_detector.npz not bundled")
    import jax

    from video_enhancer_tpu.analysis import face_net
    from video_enhancer_tpu.runtime.weights import try_load_params
    from video_enhancer_tpu.train.face_detector import evaluate

    params = try_load_params(weights, face_net.init(jax.random.PRNGKey(0)))
    assert params is not None
    recall, precision = evaluate(params, n=24, seed=777_777)
    assert recall >= 0.7, f"recall {recall:.2f}"
    assert precision >= 0.7, f"precision {precision:.2f}"


def test_detect_faces_chain_uses_nn_when_bundled(monkeypatch):
    """detect_faces routes through the neural tier when weights exist, and
    degrades to the skin-blob heuristic when they don't."""
    import pathlib

    from video_enhancer_tpu.analysis import faces
    from video_enhancer_tpu.train.face_detector import make_face_scenes

    imgs, boxes = make_face_scenes(1, seed=11)
    frame = (imgs[0] * 255).astype(np.uint8)

    weights = (pathlib.Path(__file__).resolve().parents[1]
               / "video_enhancer_tpu" / "weights" / "face_detector.npz")
    if weights.exists():
        monkeypatch.setattr(faces, "_nn", None)
        monkeypatch.setattr(faces, "_nn_failed", False)
        out = faces.detect_faces(frame)
        assert isinstance(out, list)
        assert faces._nn is not None  # neural tier actually loaded

    # With the neural tier disabled the chain still returns a list.
    monkeypatch.setattr(faces, "_nn", None)
    monkeypatch.setattr(faces, "_nn_failed", True)
    out = faces.detect_faces(frame)
    assert isinstance(out, list)


def test_nn_empty_falls_through_to_skin_blob(monkeypatch):
    """An empty neural-tier result means "no detection", not "no faces":
    the chain must consult the skin-blob heuristic (round-2 advisor;
    reference face_restoration_expert.py:521,538 semantics)."""
    from video_enhancer_tpu.analysis import faces

    frame = np.zeros((64, 64, 3), np.uint8)
    frame[8:56, 8:56] = (200, 140, 120)  # skin-toned square

    monkeypatch.setattr(faces, "_nn_faces", lambda f: [])
    sentinel = [(1, 2, 3, 4)]
    monkeypatch.setattr(faces, "_skin_blob_faces", lambda f: sentinel)
    assert faces.detect_faces(frame) is sentinel

    # A non-empty neural result still wins (first-hit priority).
    monkeypatch.setattr(faces, "_nn_faces", lambda f: [(5, 5, 10, 10)])
    assert faces.detect_faces(frame) == [(5, 5, 10, 10)]
