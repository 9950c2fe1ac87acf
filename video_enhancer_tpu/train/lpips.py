"""Calibrated perceptual metric (LPIPS stand-in) trained on synthetic
distortion ranking.

The reference uses torchvision VGG19 features for LPIPS (reference
agents/quality_assessor/quality_agent.py:107-124, 351-448) — unavailable
under zero egress. Instead a small conv feature net is trained here with a
margin ranking loss: for a clean crop and two distortions of it at
different severities, the metric must score the milder one closer. The
exported weights are bundled (weights/lpips_proxy.npz) and loaded by
agents/quality.py; a held-out test asserts Spearman rank correlation with
the true severity ordering.

Run: ``python -m video_enhancer_tpu.train.lpips --steps 400 --export
video_enhancer_tpu/weights/lpips_proxy.npz``
"""

from __future__ import annotations

import argparse

import numpy as np


def feat_init(key, widths=(16, 24, 32)):
    import jax

    from ..nn.core import conv2d_init

    ks = jax.random.split(key, len(widths))
    params = []
    cin = 3
    for k, w in zip(ks, widths):
        params.append(conv2d_init(k, 3, 3, cin, w))
        cin = w
    return params


def feat_apply(params, x):
    """x (B,H,W,3) -> list of stride-2 feature maps."""
    import jax

    from ..nn.core import conv2d_apply

    feats = []
    h = x
    for p in params:
        h = jax.nn.relu(conv2d_apply(p, h, stride=2))
        feats.append(h)
    return feats


def lpips_distance(params, a, b):
    """LPIPS-style distance: mean squared difference of channel-normalized
    features, averaged over layers, positions, and TWO image scales (the
    half-res pass catches blockiness that aliases at full res).
    a, b: (B,H,W,3)."""
    import jax
    import jax.numpy as jnp

    def norm(z):
        zf = z.astype(jnp.float32)
        return zf * jax.lax.rsqrt(
            jnp.sum(zf * zf, axis=-1, keepdims=True) + 1e-8)

    def pool2(z):
        B, H, W, C = z.shape
        z = z[:, :H // 2 * 2, :W // 2 * 2]  # tolerate odd sizes
        return z.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))

    total = jnp.zeros(a.shape[0], jnp.float32)
    n_terms = 0
    for xa, xb in ((a, b), (pool2(a), pool2(b))):
        for fa, fb in zip(feat_apply(params, xa), feat_apply(params, xb)):
            d = norm(fa) - norm(fb)
            total = total + jnp.mean(d * d, axis=(1, 2, 3))
            n_terms += 1
    return total / n_terms


import jax  # noqa: E402  (after doc; used by the functions above)
import jax.numpy as jnp  # noqa: E402

DISTORTIONS = ("blur", "noise", "jpegish", "downup")


def distort(img: np.ndarray, kind: str, severity: float,
            rng: np.random.Generator) -> np.ndarray:
    """severity in [0, 1] -> progressively worse version of img (H,W,3)."""
    import cv2

    out = img.astype(np.float32)
    if kind == "blur":
        sigma = 0.3 + 4.0 * severity
        out = cv2.GaussianBlur(out, (9, 9), sigma)
    elif kind == "noise":
        out = out + rng.normal(0, 0.02 + 0.25 * severity,
                               out.shape).astype(np.float32)
    elif kind == "jpegish":
        f = max(1.0 - 0.8 * severity, 0.15)
        h, w = out.shape[:2]
        small = cv2.resize(out, (max(int(w * f), 4), max(int(h * f), 4)))
        out = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    elif kind == "downup":
        f = max(1.0 - 0.75 * severity, 0.2)
        h, w = out.shape[:2]
        small = cv2.resize(out, (max(int(w * f), 4), max(int(h * f), 4)),
                           interpolation=cv2.INTER_AREA)
        out = cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)
    return np.clip(out, 0.0, 1.0)


def make_rank_batch(frames: np.ndarray, batch: int, crop: int, seed: int):
    """(ref, milder, worse) triplets with random distortion type."""
    rng = np.random.default_rng(seed)
    n, H, W, _ = frames.shape
    ref = np.empty((batch, crop, crop, 3), np.float32)
    mild = np.empty_like(ref)
    worse = np.empty_like(ref)
    for i in range(batch):
        f = frames[rng.integers(0, n)]
        y = rng.integers(0, max(H - crop, 1))
        x = rng.integers(0, max(W - crop, 1))
        patch = f[y:y + crop, x:x + crop].astype(np.float32)
        if patch.max() > 1.5:
            patch = patch / 255.0
        kind = DISTORTIONS[rng.integers(0, len(DISTORTIONS))]
        s1 = rng.uniform(0.05, 0.5)
        s2 = s1 + rng.uniform(0.2, 0.5)
        ref[i] = patch
        mild[i] = distort(patch, kind, s1, rng)
        worse[i] = distort(patch, kind, min(s2, 1.0), rng)
    return ref, mild, worse


def spearman(a, b) -> float:
    """Spearman rank correlation, no scipy."""
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / (denom + 1e-12))


def severity_ladder_corr(params, frames: np.ndarray, crop: int = 96,
                         n_ladders: int = 12, steps: int = 8,
                         seed: int = 12345) -> float:
    """Mean Spearman corr between metric distance and TRUE quality ordering
    (PSNR-derived) over held-out distortion ladders.

    Ground truth is the PSNR ordering, not the severity knob: the knob is
    itself non-monotonic in actual distortion strength for resampling
    artifacts (a 2x NEAREST grid at f=0.5 is cleaner than f=0.55's
    interference pattern)."""
    rng = np.random.default_rng(seed)
    dist_fn = jax.jit(lpips_distance)
    corrs = []
    n, H, W, _ = frames.shape
    sevs = np.linspace(0.05, 1.0, steps)
    for _ in range(n_ladders):
        f = frames[rng.integers(0, n)]
        y = rng.integers(0, max(H - crop, 1))
        x = rng.integers(0, max(W - crop, 1))
        patch = f[y:y + crop, x:x + crop].astype(np.float32)
        if patch.max() > 1.5:
            patch = patch / 255.0
        kind = DISTORTIONS[rng.integers(0, len(DISTORTIONS))]
        ladder = np.stack([distort(patch, kind, s, rng) for s in sevs])
        refs = np.broadcast_to(patch, ladder.shape)
        d = np.asarray(dist_fn(params, jnp.asarray(refs),
                               jnp.asarray(ladder)))
        mse = ((ladder - refs) ** 2).mean(axis=(1, 2, 3))
        quality = -10.0 * np.log10(mse + 1e-12)  # PSNR
        corrs.append(spearman(d, -quality))
    return float(np.mean(corrs))


def train(steps: int = 400, batch: int = 16, crop: int = 96,
          lr: float = 1e-3, seed: int = 0):
    import optax

    from ..io.demo import make_demo_frames

    frames = make_demo_frames(32, (192, 192))
    params = feat_init(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, ref, mild, worse):
        def loss_fn(p):
            d_mild = lpips_distance(p, ref, mild)
            d_worse = lpips_distance(p, ref, worse)
            # Temperature-scaled ranking: raw distances are O(1e-3), so an
            # unscaled margin loss sits flat at softplus(0).
            rank = jnp.mean(jax.nn.softplus(80.0 * (d_mild - d_worse) + 1.0))
            return rank

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        ref, mild, worse = make_rank_batch(frames, batch, crop, seed=i)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(ref), jnp.asarray(mild),
            jnp.asarray(worse))
        if (i + 1) % 50 == 0:
            print(f"step {i + 1}: rank loss {float(loss):.4f}")
    return params, frames


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--export", default="video_enhancer_tpu/weights/"
                                       "lpips_proxy.npz")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    from ..utils.jaxenv import setup

    setup(platform=args.platform)
    params, frames = train(steps=args.steps)
    corr = severity_ladder_corr(params, frames)
    print(f"held-out severity Spearman: {corr:.3f}")

    from ..runtime.weights import save_params

    save_params(args.export, {"layers": params})
    print(f"exported to {args.export}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
