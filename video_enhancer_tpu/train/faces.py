"""Face-restorer training on procedural synthetic face crops.

Zero-egress substitute for the reference's GFPGAN weights (reference
models/enhancement/face_restoration_expert.py): deterministic procedural
faces (skin-tone ellipse, eyes/brows/mouth/nose with randomized geometry,
lighting gradient, background clutter) are degraded by the same
blur/noise/resample ladder used elsewhere and the residual UNet in
runtime/face_handler.py is trained to invert it. Exported weights bundle as
weights/face_restorer.npz and load through the handler's weight chain.

Run: ``python -m video_enhancer_tpu.train.faces --steps 800``
"""

from __future__ import annotations

import argparse

import numpy as np

FACE_SIZE = 128


def make_face_crops(n: int, size: int = FACE_SIZE, seed: int = 0
                    ) -> np.ndarray:
    """(n, size, size, 3) float32 procedural face crops in [0, 1]."""
    import cv2

    rng = np.random.default_rng(seed)
    out = np.empty((n, size, size, 3), np.float32)
    for i in range(n):
        img = np.empty((size, size, 3), np.float32)
        # background: soft two-color gradient + clutter rectangles
        c0 = rng.uniform(0.1, 0.9, 3)
        c1 = rng.uniform(0.1, 0.9, 3)
        ramp = np.linspace(0, 1, size, dtype=np.float32)[:, None, None]
        img[:] = c0 * (1 - ramp) + c1 * ramp
        for _ in range(rng.integers(1, 4)):
            x0, y0 = rng.integers(0, size - 8, 2)
            w, h = rng.integers(8, size // 2, 2)
            img[y0:y0 + h, x0:x0 + w] = rng.uniform(0, 1, 3)

        # head: skin-tone ellipse, sampled uniformly over the same
        # light/medium/deep bands the detector trains on (round-3: the
        # round-2 range covered only the light band — see
        # docs/FACE_VALIDITY.json for the measured consequence).
        from .face_detector import _sample_skin

        skin = _sample_skin(rng)
        cx = size // 2 + int(rng.integers(-8, 9))
        cy = size // 2 + int(rng.integers(-8, 9))
        ax = int(size * rng.uniform(0.28, 0.38))
        ay = int(size * rng.uniform(0.34, 0.45))
        tilt = float(rng.uniform(-12, 12))
        cv2.ellipse(img, (cx, cy), (ax, ay), tilt, 0, 360,
                    skin.tolist(), -1)
        # hair cap
        hair = rng.uniform(0.02, 0.4, 3).tolist()
        cv2.ellipse(img, (cx, cy - ay // 2), (ax, ay // 2), tilt, 180, 360,
                    hair, -1)

        eye_dy = int(ay * 0.15)
        eye_dx = int(ax * 0.45)
        er = max(int(ax * rng.uniform(0.12, 0.18)), 2)
        iris = rng.uniform(0.05, 0.5, 3).tolist()
        for sx in (-1, 1):
            ex, ey = cx + sx * eye_dx, cy - eye_dy
            cv2.ellipse(img, (ex, ey), (er, max(er // 2, 1)), tilt, 0, 360,
                        (0.95, 0.95, 0.95), -1)
            cv2.circle(img, (ex, ey), max(er // 2, 1), iris, -1)
            cv2.circle(img, (ex, ey), max(er // 4, 1), (0.02, 0.02, 0.02),
                       -1)
            # brow
            cv2.ellipse(img, (ex, ey - er - 2), (er + 2, max(er // 3, 1)),
                        tilt, 180, 360, hair, 2)
        # nose
        cv2.line(img, (cx, cy - eye_dy // 2), (cx + int(ax * 0.08),
                 cy + int(ay * 0.15)), (skin * 0.8).tolist(), 2)
        # mouth
        mw = int(ax * rng.uniform(0.35, 0.55))
        cv2.ellipse(img, (cx, cy + int(ay * 0.45)), (mw, max(mw // 3, 2)),
                    tilt, 0, 180, (rng.uniform(0.4, 0.8), 0.15, 0.2), -1)

        # lighting gradient + mild texture
        light = 1.0 + 0.25 * (np.linspace(-1, 1, size)[None, :, None]
                              * rng.uniform(-1, 1))
        img = img * light + rng.normal(0, 0.01, img.shape)
        out[i] = np.clip(img, 0.0, 1.0)
    return out


def degrade_faces(crops: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Classic face-degradation ladder: blur -> down/up -> noise."""
    import cv2

    out = np.empty_like(crops)
    for i, img in enumerate(crops):
        sigma = rng.uniform(0.6, 3.0)
        f = cv2.GaussianBlur(img, (9, 9), sigma)
        s = rng.uniform(0.25, 0.8)
        h, w = img.shape[:2]
        small = cv2.resize(f, (max(int(w * s), 8), max(int(h * s), 8)),
                           interpolation=cv2.INTER_AREA)
        f = cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)
        f = f + rng.normal(0, rng.uniform(0.005, 0.05), f.shape)
        out[i] = np.clip(f, 0.0, 1.0)
    return out


def train(steps: int = 800, batch: int = 16, lr: float = 2e-4,
          seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from ..runtime.face_handler import _face_net_apply, _face_net_init

    params = _face_net_init(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, deg, clean):
        def loss_fn(p):
            out = _face_net_apply(p, deg)
            return jnp.mean(jnp.sqrt((out - clean) ** 2 + 1e-6))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for i in range(steps):
        clean = make_face_crops(batch, seed=1000 + i)
        deg = degrade_faces(clean, rng)
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(deg),
                                          jnp.asarray(clean))
        if (i + 1) % 100 == 0:
            print(f"step {i + 1}: loss {float(loss):.4f}")
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--export", default="video_enhancer_tpu/weights/"
                                       "face_restorer.npz")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    from ..utils.jaxenv import setup

    setup(platform=args.platform)

    import jax
    import jax.numpy as jnp

    from ..runtime.face_handler import _face_net_apply
    from ..runtime.weights import save_params
    from ..utils.metrics import psnr

    params = train(steps=args.steps)

    # Held-out eval: restoration must beat the degraded input.
    clean = make_face_crops(16, seed=999_999)
    deg = degrade_faces(clean, np.random.default_rng(123))
    out = jax.jit(_face_net_apply)(params, jnp.asarray(deg))
    p_in = float(psnr(jnp.asarray(deg), jnp.asarray(clean)))
    p_out = float(psnr(out, jnp.asarray(clean)))
    print(f"held-out: restored {p_out:.2f} dB vs degraded {p_in:.2f} dB")

    save_params(args.export, params)
    print(f"exported to {args.export}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
