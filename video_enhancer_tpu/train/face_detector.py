"""Face-detector training on procedural synthetic scenes.

Zero-egress substitute for the reference's downloadable detectors
(reference models/enhancement/face_restoration_expert.py:490-577). Scenes
are cluttered backgrounds with 0-3 procedural faces at random scales and
positions, plus skin-colored featureless distractors (so the net must use
facial structure, not just skin color). Targets follow CenterNet: a
Gaussian-splat center heatmap with penalty-reduced focal loss, plus L1 on
log-size and center offset at positive cells.

Run: ``python -m video_enhancer_tpu.train.face_detector --steps 1200``
"""

from __future__ import annotations

import argparse

import numpy as np

from ..analysis.face_net import GRID, INPUT_SIZE, STRIDE


# Skin-tone bands for training and validity evaluation (RGB multiplier
# ranges). "light" matches the round-2 training distribution; "medium" and
# "deep" extend it — the validity report (scripts/face_validity.py)
# measures the detector per band so the claim boundary is explicit.
SKIN_BANDS = {
    "light": ((0.70, 0.95), (0.52, 0.75), (0.42, 0.65)),
    "medium": ((0.45, 0.72), (0.32, 0.55), (0.22, 0.45)),
    "deep": ((0.18, 0.45), (0.12, 0.34), (0.08, 0.28)),
}


def _sample_skin(rng, skin_band=None):
    if skin_band is None:
        # Training default: union of the bands (uniform band choice, then
        # uniform within) so no band is out-of-distribution.
        skin_band = ("light", "medium", "deep")[int(rng.integers(0, 3))]
    (r0, r1), (g0, g1), (b0, b1) = SKIN_BANDS[skin_band]
    return np.array([rng.uniform(r0, r1), rng.uniform(g0, g1),
                     rng.uniform(b0, b1)], np.float32)


def _draw_face(img, rng, cx, cy, ax, ay, skin_band=None, occlude=False):
    """Draw one procedural face; returns its (x, y, w, h) box."""
    import cv2

    skin = _sample_skin(rng, skin_band)
    tilt = float(rng.uniform(-12, 12))
    cv2.ellipse(img, (cx, cy), (ax, ay), tilt, 0, 360, skin.tolist(), -1)
    hair = rng.uniform(0.02, 0.4, 3).tolist()
    cv2.ellipse(img, (cx, cy - ay // 2), (ax, ay // 2), tilt, 180, 360,
                hair, -1)
    eye_dy, eye_dx = int(ay * 0.15), int(ax * 0.45)
    er = max(int(ax * rng.uniform(0.12, 0.18)), 1)
    iris = rng.uniform(0.05, 0.5, 3).tolist()
    for sx in (-1, 1):
        ex, ey = cx + sx * eye_dx, cy - eye_dy
        cv2.ellipse(img, (ex, ey), (er, max(er // 2, 1)), tilt, 0, 360,
                    (0.95, 0.95, 0.95), -1)
        cv2.circle(img, (ex, ey), max(er // 2, 1), iris, -1)
    cv2.line(img, (cx, cy - eye_dy // 2),
             (cx + max(int(ax * 0.08), 1), cy + int(ay * 0.15)),
             (skin * 0.8).tolist(), 1)
    mw = max(int(ax * rng.uniform(0.35, 0.55)), 2)
    cv2.ellipse(img, (cx, cy + int(ay * 0.45)), (mw, max(mw // 3, 1)),
                tilt, 0, 180, (float(rng.uniform(0.4, 0.8)), 0.15, 0.2), -1)
    if occlude:
        # Partial occluder (hand/pole/mask) over up to ~35% of the face.
        oc = rng.uniform(0.1, 0.9, 3).tolist()
        side = int(rng.integers(0, 3))
        ow = max(int(2 * ax * rng.uniform(0.2, 0.35)), 2)
        if side == 0:   # vertical bar across one side
            x0 = cx + int(rng.choice((-1, 1)) * ax * 0.5)
            cv2.rectangle(img, (x0 - ow // 2, cy - ay),
                          (x0 + ow // 2, cy + ay), oc, -1)
        elif side == 1:  # lower-face mask
            cv2.rectangle(img, (cx - ax, cy + int(ay * 0.15)),
                          (cx + ax, cy + int(ay * 0.7)), oc, -1)
        else:            # corner blob
            cv2.circle(img, (cx + int(ax * 0.6), cy - int(ay * 0.6)),
                       max(int(ax * 0.45), 2), oc, -1)
    return (cx - ax, cy - ay, 2 * ax, 2 * ay)


def make_face_scenes(n: int, size: int = INPUT_SIZE, seed: int = 0,
                     skin_band: str | None = None,
                     scale_range: tuple[float, float] = (0.09, 0.3),
                     occlude_prob: float = 0.0):
    """Returns (imgs (n,size,size,3) float32, list of per-image box lists).

    ``skin_band`` pins faces to one SKIN_BANDS entry (None = uniform over
    all bands); ``scale_range`` bounds the face half-height as a fraction
    of the image; ``occlude_prob`` partially occludes that fraction of
    faces. The validity report strata use these knobs."""
    import cv2

    rng = np.random.default_rng(seed)
    imgs = np.empty((n, size, size, 3), np.float32)
    all_boxes = []
    for i in range(n):
        img = np.empty((size, size, 3), np.float32)
        c0, c1 = rng.uniform(0.1, 0.9, 3), rng.uniform(0.1, 0.9, 3)
        ramp = np.linspace(0, 1, size, dtype=np.float32)[:, None, None]
        img[:] = c0 * (1 - ramp) + c1 * ramp
        for _ in range(rng.integers(1, 5)):
            x0, y0 = rng.integers(0, size - 8, 2)
            w, h = rng.integers(8, size // 2, 2)
            img[y0:y0 + h, x0:x0 + w] = rng.uniform(0, 1, 3)
        # skin-colored featureless distractors (hands, walls, ...)
        for _ in range(rng.integers(0, 3)):
            dc = (float(rng.uniform(0.55, 0.95)), float(rng.uniform(0.4, 0.75)),
                  float(rng.uniform(0.3, 0.65)))
            dx, dy = int(rng.integers(8, size - 8)), int(rng.integers(8, size - 8))
            da = int(rng.integers(4, size // 4))
            if rng.random() < 0.5:
                cv2.ellipse(img, (dx, dy), (da, int(da * rng.uniform(0.5, 2.0)) + 1),
                            float(rng.uniform(0, 180)), 0, 360, dc, -1)
            else:
                cv2.rectangle(img, (dx - da, dy - da), (dx + da, dy + da), dc, -1)

        boxes = []
        for _ in range(int(rng.integers(0, 4))):
            ay = int(size * rng.uniform(*scale_range))
            ax = max(int(ay * rng.uniform(0.7, 0.9)), 3)
            cx = int(rng.integers(ax + 1, size - ax - 1))
            cy = int(rng.integers(ay + 1, size - ay - 1))
            cand = (cx - ax, cy - ay, 2 * ax, 2 * ay)
            if any(_iou(cand, b) > 0.2 for b in boxes):
                continue
            boxes.append(_draw_face(
                img, rng, cx, cy, ax, ay, skin_band=skin_band,
                occlude=bool(rng.random() < occlude_prob)))

        # photometric jitter + degradations (match deployment conditions)
        img = img * (1.0 + 0.25 * np.linspace(-1, 1, size)[None, :, None]
                     * rng.uniform(-1, 1))
        if rng.random() < 0.5:
            img = cv2.GaussianBlur(img, (5, 5), rng.uniform(0.3, 1.5))
        img = img + rng.normal(0, rng.uniform(0.005, 0.04), img.shape)
        imgs[i] = np.clip(img, 0.0, 1.0)
        all_boxes.append(boxes)
    return imgs, all_boxes


def _draw_alt_face(img, rng, cx, cy, ax, ay, skin_band=None,
                   occlude=False):
    """Structurally different face compositor (round-4 verdict item 9):
    polygonal jaw instead of an ellipse, asymmetric 3/4-pose feature
    placement, eyebrows/nose-shadow/ears/glasses the training generator
    never draws. Same skin bands (the claim axis stays comparable)."""
    import cv2

    skin = _sample_skin(rng, skin_band)
    pose = float(rng.uniform(-0.35, 0.35))     # lateral feature shift
    # Polygonal head: 8-point jawline with a chin vertex.
    angs = np.linspace(-np.pi / 2, 3 * np.pi / 2, 9)[:-1]
    rx = ax * (1.0 + rng.uniform(-0.08, 0.08, angs.size))
    ry = ay * (1.0 + rng.uniform(-0.08, 0.08, angs.size))
    pts = np.stack([cx + rx * np.cos(angs) * (1 + 0.2 * np.sin(angs)),
                    cy + ry * np.sin(angs)], axis=1)
    pts[0, 1] += ay * 0.15  # chin point
    cv2.fillPoly(img, [pts.astype(np.int32)], skin.tolist())
    # Radial shading (the training faces are flat-shaded).
    shade = (skin * rng.uniform(0.6, 0.85)).tolist()
    cv2.ellipse(img, (int(cx + pose * ax), cy), (int(ax * 0.35), ay),
                0, 60, 300, shade, max(int(ax * 0.12), 1))
    # Ears.
    for sx in (-1, 1):
        cv2.ellipse(img, (cx + sx * int(ax * 0.98), cy),
                    (max(int(ax * 0.14), 1), max(int(ay * 0.22), 1)),
                    0, 0, 360, (skin * 0.9).tolist(), -1)
    eye_dx = int(ax * 0.42)
    eye_y = cy - int(ay * 0.18)
    er = max(int(ax * rng.uniform(0.10, 0.16)), 1)
    iris = rng.uniform(0.05, 0.45, 3).tolist()
    brow = (skin * 0.35).tolist()
    for sx in (-1, 1):
        ex = cx + int(sx * eye_dx + pose * ax * 0.5)
        # Almond eye: two filled triangles.
        eye_pts = np.array([[ex - er * 2, eye_y], [ex + er * 2, eye_y],
                            [ex, eye_y + er]], np.int32)
        cv2.fillPoly(img, [eye_pts], (0.92, 0.92, 0.9))
        cv2.circle(img, (ex, eye_y), max(er // 2, 1), iris, -1)
        # Eyebrow.
        cv2.line(img, (ex - er * 2, eye_y - er * 2),
                 (ex + er * 2, eye_y - er * 2 - int(er * rng.uniform(0, 1))),
                 brow, max(er // 2, 1))
    if rng.random() < 0.3:  # glasses
        gl = rng.uniform(0.05, 0.3, 3).tolist()
        for sx in (-1, 1):
            cv2.circle(img, (cx + int(sx * eye_dx + pose * ax * 0.5),
                             eye_y), er * 2, gl, 1)
        cv2.line(img, (cx - eye_dx + er * 2, eye_y),
                 (cx + eye_dx - er * 2, eye_y), gl, 1)
    # Nose: shaded triangle (training uses a single line).
    nx = cx + int(pose * ax * 0.7)
    nose = np.array([[nx, cy - int(ay * 0.1)],
                     [nx - max(int(ax * 0.12), 1), cy + int(ay * 0.22)],
                     [nx + max(int(ax * 0.16), 1), cy + int(ay * 0.22)]],
                    np.int32)
    cv2.fillPoly(img, [nose], (skin * 0.8).tolist())
    # Lips: two stacked thin rectangles.
    lw = max(int(ax * rng.uniform(0.3, 0.5)), 2)
    ly = cy + int(ay * 0.5)
    lip = (float(rng.uniform(0.45, 0.75)), 0.2, 0.25)
    cv2.rectangle(img, (cx - lw + int(pose * ax * 0.5), ly - max(lw // 6, 1)),
                  (cx + lw + int(pose * ax * 0.5), ly + max(lw // 6, 1)),
                  lip, -1)
    if rng.random() < 0.35:  # stubble texture on the lower face
        ys = slice(max(cy, 0), min(cy + ay, img.shape[0]))
        xs = slice(max(cx - ax, 0), min(cx + ax, img.shape[1]))
        patch = img[ys, xs]
        patch -= (rng.random(patch.shape[:2])[..., None] < 0.25) \
            * rng.uniform(0.05, 0.18)
    if occlude:
        oc = rng.uniform(0.1, 0.9, 3).tolist()
        if rng.random() < 0.5:  # diagonal bar (training uses axis-aligned)
            p0 = (cx - ax, cy + int(rng.integers(-ay, ay)))
            p1 = (cx + ax, cy + int(rng.integers(-ay, ay)))
            cv2.line(img, p0, p1, oc, max(int(ay * 0.4), 2))
        else:  # hood: top arc filled
            cv2.ellipse(img, (cx, cy - int(ay * 0.3)),
                        (int(ax * 1.05), int(ay * 0.8)), 0, 180, 360,
                        oc, -1)
    return (cx - ax, cy - ay, 2 * ax, 2 * ay)


def make_alt_face_scenes(n: int, size: int = INPUT_SIZE, seed: int = 0,
                         skin_band: str | None = None,
                         scale_range: tuple[float, float] = (0.09, 0.3),
                         occlude_prob: float = 0.0):
    """Cross-generator eval scenes (round-4 verdict item 9): alt face
    compositor + low-frequency noise backgrounds + line clutter + JPEG/
    motion-blur degradations — all structurally disjoint from
    ``make_face_scenes``. Same return contract."""
    import cv2

    rng = np.random.default_rng(seed ^ 0x5EED_FACE)
    imgs = np.empty((n, size, size, 3), np.float32)
    all_boxes = []
    for i in range(n):
        # Low-frequency noise background (vs the training ramp+rects).
        small = rng.random((6, 6, 3)).astype(np.float32)
        img = np.ascontiguousarray(
            cv2.resize(small, (size, size), interpolation=cv2.INTER_CUBIC))
        img = np.clip(img, 0, 1)
        for _ in range(int(rng.integers(2, 7))):  # line clutter
            p0 = tuple(int(v) for v in rng.integers(0, size, 2))
            p1 = tuple(int(v) for v in rng.integers(0, size, 2))
            cv2.line(img, p0, p1, rng.uniform(0, 1, 3).tolist(),
                     int(rng.integers(1, 4)))
        # Skin-colored polygon distractors.
        for _ in range(int(rng.integers(0, 3))):
            dc = (float(rng.uniform(0.5, 0.95)),
                  float(rng.uniform(0.35, 0.7)),
                  float(rng.uniform(0.25, 0.6)))
            ctr = rng.integers(12, size - 12, 2)
            verts = ctr + rng.integers(-14, 15, (5, 2))
            cv2.fillPoly(img, [verts.astype(np.int32)], dc)

        boxes = []
        for _ in range(int(rng.integers(0, 4))):
            ay = int(size * rng.uniform(*scale_range))
            ax = max(int(ay * rng.uniform(0.65, 0.95)), 3)
            cx = int(rng.integers(ax + 1, size - ax - 1))
            cy = int(rng.integers(ay + 1, size - ay - 1))
            cand = (cx - ax, cy - ay, 2 * ax, 2 * ay)
            if any(_iou(cand, b) > 0.2 for b in boxes):
                continue
            boxes.append(_draw_alt_face(
                img, rng, cx, cy, ax, ay, skin_band=skin_band,
                occlude=bool(rng.random() < occlude_prob)))

        # Degradations the training pipeline never applies: directional
        # motion blur + JPEG re-encode + gamma shift.
        if rng.random() < 0.5:
            k = int(rng.integers(3, 8))
            kern = np.zeros((k, k), np.float32)
            kern[k // 2] = 1.0 / k
            ang = float(rng.uniform(0, 180))
            rot = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), ang, 1)
            kern = cv2.warpAffine(kern, rot, (k, k))
            kern /= max(kern.sum(), 1e-6)
            img = cv2.filter2D(img, -1, kern)
        img = np.clip(img, 0, 1) ** float(rng.uniform(0.8, 1.25))
        if rng.random() < 0.6:
            q = int(rng.integers(40, 90))
            ok, enc = cv2.imencode(
                ".jpg", (img * 255).astype(np.uint8)[:, :, ::-1],
                [int(cv2.IMWRITE_JPEG_QUALITY), q])
            if ok:
                img = cv2.imdecode(enc, cv2.IMREAD_COLOR)[
                    :, :, ::-1].astype(np.float32) / 255.0
        imgs[i] = np.clip(img, 0.0, 1.0)
        all_boxes.append(boxes)
    return imgs, all_boxes


def _iou(a, b) -> float:
    ax, ay, aw, ah = a
    bx, by, bw, bh = b
    x1, y1 = max(ax, bx), max(ay, by)
    x2, y2 = min(ax + aw, bx + bw), min(ay + ah, by + bh)
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    union = aw * ah + bw * bh - inter
    return inter / union if union > 0 else 0.0


def encode_targets(boxes_per_img, batch: int) -> tuple:
    """CenterNet targets: heatmap (B,G,G), regression (B,G,G,4), mask."""
    heat = np.zeros((batch, GRID, GRID), np.float32)
    reg = np.zeros((batch, GRID, GRID, 4), np.float32)
    mask = np.zeros((batch, GRID, GRID), np.float32)
    gy_idx, gx_idx = np.mgrid[0:GRID, 0:GRID]
    for b, boxes in enumerate(boxes_per_img):
        for (x, y, w, h) in boxes:
            cx, cy = (x + w / 2) / STRIDE, (y + h / 2) / STRIDE
            gx, gy = min(int(cx), GRID - 1), min(int(cy), GRID - 1)
            sigma = max(min(w, h) / STRIDE / 3.0, 0.7)
            splat = np.exp(-((gx_idx - cx) ** 2 + (gy_idx - cy) ** 2)
                           / (2 * sigma * sigma)).astype(np.float32)
            heat[b] = np.maximum(heat[b], splat)
            reg[b, gy, gx] = (np.log(max(w / STRIDE, 1e-3)),
                              np.log(max(h / STRIDE, 1e-3)),
                              cx - gx, cy - gy)
            mask[b, gy, gx] = 1.0
            heat[b, gy, gx] = 1.0
    return heat, reg, mask


def evaluate(params, n: int = 64, seed: int = 424_242,
             iou_thresh: float = 0.5, detect_fn=None,
             generator: str = "train", **scene_kw) -> tuple[float, float]:
    """(recall, precision) at IoU 0.5 over held-out synthetic scenes.

    ``detect_fn(frame_u8) -> boxes`` overrides the bundled neural detector
    (used by the validity report to score the full chain or an external
    YuNet-ONNX detector on identical strata); ``generator`` selects the
    scene family ("train" = make_face_scenes, "alt" = the structurally
    disjoint make_alt_face_scenes); ``scene_kw`` forwards
    skin_band/scale_range/occlude_prob."""
    import jax

    from ..analysis import face_net

    if detect_fn is None:
        fwd = jax.jit(face_net.apply)
        detect_fn = lambda frame: face_net.detect(params, frame,
                                                  forward=fwd)
    scenes = {"train": make_face_scenes,
              "alt": make_alt_face_scenes}[generator]
    imgs, gt = scenes(n, seed=seed, **scene_kw)
    tp = fp = fn = 0
    for i in range(n):
        frame = (imgs[i] * 255).astype(np.uint8)
        det = detect_fn(frame)
        matched = set()
        for d in det:
            hit = None
            for j, g in enumerate(gt[i]):
                if j not in matched and _iou(d, g) >= iou_thresh:
                    hit = j
                    break
            if hit is None:
                fp += 1
            else:
                matched.add(hit)
                tp += 1
        fn += len(gt[i]) - len(matched)
    recall = tp / max(tp + fn, 1)
    precision = tp / max(tp + fp, 1)
    return recall, precision


def train(steps: int = 1200, batch: int = 16, lr: float = 3e-4,
          seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from ..analysis import face_net

    params = face_net.init(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, imgs, heat, reg, mask):
        def loss_fn(p):
            out = face_net.apply(p, imgs)
            prob = jax.nn.sigmoid(out[..., 0])
            prob = jnp.clip(prob, 1e-5, 1.0 - 1e-5)
            pos = (heat >= 1.0 - 1e-6).astype(jnp.float32)
            # penalty-reduced focal loss (CenterNet eq. 1)
            pos_loss = -pos * ((1 - prob) ** 2) * jnp.log(prob)
            neg_loss = -(1 - pos) * ((1 - heat) ** 4) * (prob ** 2) \
                * jnp.log(1 - prob)
            n_pos = jnp.maximum(pos.sum(), 1.0)
            l_heat = (pos_loss.sum() + neg_loss.sum()) / n_pos
            l_reg = (jnp.abs(out[..., 1:5] - reg).sum(-1) * mask).sum() \
                / n_pos
            return l_heat + l_reg

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        imgs, boxes = make_face_scenes(batch, seed=10_000 + i)
        heat, reg, mask = encode_targets(boxes, batch)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(heat),
            jnp.asarray(reg), jnp.asarray(mask))
        if (i + 1) % 100 == 0:
            print(f"step {i + 1}: loss {float(loss):.4f}")
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--export", default="video_enhancer_tpu/weights/"
                                       "face_detector.npz")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    from ..utils.jaxenv import setup

    setup(platform=args.platform)

    from ..runtime.weights import save_params

    params = train(steps=args.steps)
    recall, precision = evaluate(params)
    print(f"held-out IoU@0.5: recall {recall:.3f} precision {precision:.3f}")

    save_params(args.export, params)
    print(f"exported to {args.export}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
