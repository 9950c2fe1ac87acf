"""Synthetic degradation training data.

VSR training pairs manufactured on the fly: HR crops from source frames
(any video, or the deterministic demo generator), degraded to LR by a
RANDOMIZED wide pipeline (Real-ESRGAN-style: random blur family ->
random resampler -> random noise family -> random compression family).
No dataset downloads (zero-egress environment); same philosophy as the
reference's synthetic-fixture strategy (SURVEY.md §4).

Round 4: the round-3 models — trained on one fixed degradation chain
(Gaussian blur + AREA + Gaussian noise + resize smear) and one content
generator (io/demo.py) — measured NEGATIVE gains on the cross-generator
eval family (scripts/crossgen_eval.py): pure generator overfit. The
training distribution is therefore widened on both axes: ``_degrade``
samples per-clip from blur/resample/noise/compression FAMILIES, and
``make_train_frames`` mixes the demo generator with spectrally-shaped
noise fields and independently-moving sprites. The eval family
(train/evalgen.py) stays structurally held out: its texture processes
(octave value noise, Voronoi, stripe interference), camera model (affine
rotate/zoom + sinusoidal warp), and its fixed degradation chain are never
sampled here.
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_pairs", "pair_iterator", "make_triplets",
           "triplet_iterator", "make_train_frames"]


def _rand_blur(f: np.ndarray, kind: int, sigma: float,
               mkernel: np.ndarray | None, ksize: int = 5):
    import cv2

    if kind == 0:
        return f  # no blur
    if kind == 1:
        return cv2.GaussianBlur(f, (ksize, ksize), sigma)
    return cv2.filter2D(f, -1, mkernel)


def _rand_motion_kernel(rng: np.random.Generator, ksize: int = 5
                        ) -> np.ndarray:
    import cv2

    k = np.zeros((ksize, ksize), np.float32)
    theta = rng.uniform(0, np.pi)
    c = (ksize - 1) / 2.0
    length = rng.uniform(1.5, ksize - 1.0)
    p0 = (int(round(c - np.cos(theta) * length / 2)),
          int(round(c - np.sin(theta) * length / 2)))
    p1 = (int(round(c + np.cos(theta) * length / 2)),
          int(round(c + np.sin(theta) * length / 2)))
    cv2.line(k, p0, p1, 1.0, 1)
    s = k.sum()
    if s <= 0:
        k[int(c), int(c)] = 1.0
        s = 1.0
    return k / s


def _degrade(hr: np.ndarray, scale: int, rng: np.random.Generator,
             wide: bool = False) -> np.ndarray:
    """Wide randomized degradation: one draw per clip (consistent within
    the clip, like a real capture chain).

    ``wide=True`` (training only — pair_iterator sets it; the held-out
    ``ind`` eval keeps the default so round-4 numbers stay comparable)
    raises the severity ceiling and the per-op firing rates: round-4
    measured negative transfer to compound-degraded content
    (BENCH_RESULTS.md round-4 table, alt column), and the default chain's
    independent draws make "every op fires hard" a rare event — blur
    capped at 5x5/sigma 2, noise at 0.04, and each op skipped 1/3 of the
    time. Wide mode: blur up to 9x9/sigma 3 and fires 4/5 of the time,
    noise to 0.06, quantization p 0.45 with 4-bit floor, compression
    fires 4/5 of the time with JPEG q down to 30."""
    import cv2

    t, h, w, _ = hr.shape
    lh, lw = h // scale, w // scale
    lr = np.empty((t, lh, lw, 3), np.float32)

    if wide:
        blur_kind = int(rng.choice(3, p=[0.2, 0.4, 0.4]))
        ksize = int(rng.choice([5, 7, 9]))
        sigma = rng.uniform(0.2, 3.0)
        mkernel = _rand_motion_kernel(rng, ksize) if blur_kind == 2 else None
        interp = [cv2.INTER_AREA, cv2.INTER_LINEAR,
                  cv2.INTER_CUBIC][int(rng.integers(0, 3))]
        noise_kind = int(rng.choice(3, p=[0.2, 0.4, 0.4]))
        noise_std = rng.uniform(0.005, 0.06)
        quantize = rng.random() < 0.45
        qbits_lo = 4
        comp_kind = int(rng.choice(3, p=[0.2, 0.4, 0.4]))
        jpeg_q = int(rng.integers(30, 90))
    else:
        # NOTE: this branch preserves the round-4 RNG draw ORDER exactly
        # (blur -> mkernel -> interp -> noise -> quant -> compression):
        # the held-out eval realizations are a function of draw order, so
        # reordering would silently re-draw every historical gain number
        # (caught round 5: a reorder made the seedvr2 snapshot re-measure
        # -1.33 where round 4 recorded -2.73 on the same weights).
        blur_kind = int(rng.integers(0, 3))  # none / gaussian / motion
        ksize = 5
        sigma = rng.uniform(0.2, 2.0)
        mkernel = _rand_motion_kernel(rng) if blur_kind == 2 else None
        interp = [cv2.INTER_AREA, cv2.INTER_LINEAR,
                  cv2.INTER_CUBIC][int(rng.integers(0, 3))]
        noise_kind = int(rng.integers(0, 3))  # none / gaussian / uniform
        noise_std = rng.uniform(0.005, 0.04)
        quantize = rng.random() < 0.3
        qbits_lo = 5
        comp_kind = int(rng.integers(0, 3))  # none / resize smear / jpeg
        jpeg_q = int(rng.integers(40, 90))

    for i in range(t):
        f = _rand_blur(hr[i], blur_kind, sigma, mkernel, ksize)
        lr[i] = cv2.resize(f, (lw, lh), interpolation=interp)
    if noise_kind == 1:
        lr += rng.normal(0, noise_std, lr.shape).astype(np.float32)
    elif noise_kind == 2:
        lr += rng.uniform(-noise_std * 1.7, noise_std * 1.7,
                          lr.shape).astype(np.float32)
    if quantize:
        bits = int(rng.integers(qbits_lo, 7))
        levels = (1 << bits) - 1
        lr = np.floor(np.clip(lr, 0, 1) * levels + 0.5) / levels
    if comp_kind == 1:
        for i in range(t):
            small = cv2.resize(lr[i], (lw * 3 // 4, lh * 3 // 4))
            lr[i] = cv2.resize(small, (lw, lh),
                               interpolation=cv2.INTER_LINEAR)
    elif comp_kind == 2:
        for i in range(t):
            u8 = np.clip(lr[i] * 255.0, 0, 255).astype(np.uint8)
            ok, enc = cv2.imencode(".jpg", u8,
                                   [cv2.IMWRITE_JPEG_QUALITY, jpeg_q])
            if ok:
                lr[i] = cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(
                    np.float32) / 255.0
    return np.clip(lr, 0.0, 1.0)


def _disk_kernel(rng: np.random.Generator) -> np.ndarray:
    """Defocus (disk) blur kernel — a blur family distinct from both the
    training Gaussian/linear-motion kernels and evalgen's motion blur."""
    r = float(rng.uniform(1.0, 3.0))
    k = int(2 * np.ceil(r) + 1)
    yy, xx = np.mgrid[0:k, 0:k].astype(np.float32)
    c = (k - 1) / 2.0
    disk = ((yy - c) ** 2 + (xx - c) ** 2 <= r * r).astype(np.float32)
    return disk / disk.sum()


def _degrade_chain(hr: np.ndarray, scale: int, rng: np.random.Generator
                   ) -> np.ndarray:
    """Third training degradation family (round 5): an ALWAYS-COMPOUND
    fixed-structure chain, like real capture chains — defocus/anisotropic
    blur -> aliasing-prone resample (nearest/Lanczos) -> value-dependent
    shot noise -> WebP round-trip. Every op is a different process from
    both the randomized `_degrade` families and evalgen's held-out chain
    (motion blur -> bilinear -> 5-bit quant -> JPEG). Round-5 measured
    motivation: raw severity widening (wide=True alone) made BOTH eval
    families worse on vsrm (ind 0.85->0.72, alt -0.27->-0.60) — what the
    models lack is exposure to compound chain STRUCTURE, not harder
    single ops."""
    import cv2

    t, h, w, _ = hr.shape
    lh, lw = h // scale, w // scale
    if rng.random() < 0.5:
        kern = _disk_kernel(rng)
    else:
        # Rotated anisotropic Gaussian.
        sx, sy = rng.uniform(0.4, 2.5, 2)
        theta = rng.uniform(0, np.pi)
        k = 7
        yy, xx = np.mgrid[0:k, 0:k].astype(np.float32) - (k - 1) / 2.0
        xr = xx * np.cos(theta) + yy * np.sin(theta)
        yr = -xx * np.sin(theta) + yy * np.cos(theta)
        kern = np.exp(-0.5 * ((xr / sx) ** 2 + (yr / sy) ** 2))
        kern /= kern.sum()
    interp = cv2.INTER_NEAREST if rng.random() < 0.5 else cv2.INTER_LANCZOS4
    shot = rng.uniform(200.0, 1200.0)  # photons at full scale
    webp_q = int(rng.integers(20, 75))

    lr = np.empty((t, lh, lw, 3), np.float32)
    for i in range(t):
        f = cv2.filter2D(hr[i], -1, kern)
        f = cv2.resize(f, (lw, lh), interpolation=interp)
        f = rng.poisson(np.clip(f, 0, 1) * shot).astype(np.float32) / shot
        u8 = np.clip(f * 255.0, 0, 255).astype(np.uint8)
        ok, enc = cv2.imencode(".webp", u8,
                               [cv2.IMWRITE_WEBP_QUALITY, webp_q])
        if ok:
            dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)
            if dec is not None:
                u8 = dec
        lr[i] = u8.astype(np.float32) / 255.0
    return np.clip(lr, 0.0, 1.0)


def _spectral_texture(rng: np.random.Generator, h: int, w: int,
                      slope: float) -> np.ndarray:
    """Power-law-filtered Gaussian noise field in [0, 1] (FFT-shaped —
    a different process from evalgen's resize-octave value noise)."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    rad = np.sqrt(fy * fy + fx * fx)
    rad[0, 0] = 1.0
    spec = (np.fft.rfft2(rng.standard_normal((h, w)))
            * (rad ** (-slope))).astype(np.complex64)
    img = np.fft.irfft2(spec, s=(h, w)).astype(np.float32)
    img -= img.min()
    return img / max(img.max(), 1e-6)


def _mosaic_texture(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Random rectangular mosaic: piecewise-flat cells with hard edges
    (the statistic class of cell maps, via a different process than
    evalgen's Voronoi)."""
    img = np.empty((h, w, 3), np.float32)
    img[:] = rng.uniform(0, 1, 3)
    for _ in range(int(rng.integers(30, 90))):
        x0, y0 = int(rng.integers(0, w - 4)), int(rng.integers(0, h - 4))
        bw = int(rng.integers(4, max(w // 3, 5)))
        bh = int(rng.integers(4, max(h // 3, 5)))
        img[y0:y0 + bh, x0:x0 + bw] = rng.uniform(0, 1, 3)
    return img


def _plaid_texture(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Outer sum of two random 1-D step/wave profiles: periodic-ish grid
    structure (vs evalgen's rotated sinusoidal stripes)."""
    def profile(n):
        steps = np.repeat(rng.uniform(0, 1, max(n // int(rng.integers(4, 17)),
                                                2)), n)[:n]
        wave = 0.5 + 0.5 * np.sin(np.arange(n) * rng.uniform(0.05, 0.6)
                                  + rng.uniform(0, 6.28))
        a = rng.uniform(0.2, 0.8)
        return a * steps + (1 - a) * wave

    py, px = profile(h)[:, None], profile(w)[None, :]
    base = (py + px) / 2
    return np.stack([base * c for c in rng.uniform(0.4, 1.0, 3)],
                    axis=-1).astype(np.float32)


def make_train_frames(frames: int = 48,
                      size_hw: tuple[int, int] = (256, 256),
                      seed: int = 0, mode: int | None = None) -> np.ndarray:
    """Diverse training clips. ``mode`` selects the content/motion process
    (None = seeded choice):

    0. spectral-noise background + sprites, integer-pixel scroll (round-4a)
    1. rectangular-mosaic field under global affine drift — SUBPIXEL
       resampling motion (cv2.warpAffine per frame)
    2. plaid/step grid under subpixel translation + brightness drift
    3. smooth gradient field + polygon sprites with subpixel velocities
    4. composite texture under a smooth random FLOW-FIELD warp + a
       random-walk camera (round 5): every pixel moves non-rigidly with
       its own subpixel velocity — the motion class the alt eval family
       exercises (its warpAffine camera + remap deformation) that modes
       0-3 never produce (they move rigid wholes or sprites)

    Modes 1-3 were added after the round-4 crossgen measurement: with only
    mode-0 content the retrained models still scored NEGATIVE on the alt
    family — its failure axis was content statistics (flat cells, hard
    edges, periodicity) and resampled subpixel motion, both absent from
    mode 0. The processes here stay structurally distinct from
    train/evalgen.py (mosaic!=Voronoi, plaid!=rotated stripes, affine
    drift parameterization != evalgen's rotate/zoom+sinusoidal warp,
    mode 4's Gaussian-smoothed random flow + integrated-random-walk
    camera != evalgen's analytic sinusoidal warp + sinusoidal camera).
    Returns (frames, h, w, 3) uint8."""
    import cv2

    h, w = size_hw
    rng = np.random.default_rng(seed)
    if mode is None:
        mode = int(rng.integers(0, 5))
    if mode == 4:
        return _make_flow_clip(rng, frames, h, w)
    if mode != 0:
        return _make_warped_clip(rng, frames, h, w, mode)
    slope = rng.uniform(0.8, 2.2)
    bg = np.stack([_spectral_texture(rng, h * 2, w * 2, slope)
                   for _ in range(3)], axis=-1)
    bg = (bg * rng.uniform(120, 255, (1, 1, 3))).astype(np.float32)
    vx, vy = rng.uniform(-3, 3), rng.uniform(-3, 3)

    n_sprites = int(rng.integers(2, 6))
    sprites = [{
        "pos": rng.uniform([0, 0], [w, h]),
        "vel": rng.uniform(-4, 4, 2),
        "size": rng.uniform(h / 16, h / 5),
        "color": rng.uniform(40, 250, 3),
        "poly": rng.random() < 0.5,
        "nv": int(rng.integers(3, 7)),
        "phase": rng.uniform(0, 2 * np.pi),
    } for _ in range(n_sprites)]

    out = np.empty((frames, h, w, 3), np.uint8)
    for t in range(frames):
        x0 = int(w / 2 + vx * t) % w
        y0 = int(h / 2 + vy * t) % h
        img = bg[y0:y0 + h, x0:x0 + w].copy()
        flick = 1.0 + 0.08 * np.sin(2 * np.pi * t / max(frames, 1)
                                    + sprites[0]["phase"])
        for s in sprites:
            cx, cy = s["pos"] + s["vel"] * t
            cx, cy = int(cx) % w, int(cy) % h
            color = tuple(float(c) * flick for c in s["color"])
            if s["poly"]:
                ang = s["phase"] + 0.1 * t
                pts = np.stack([
                    cx + s["size"] * np.cos(ang + 2 * np.pi
                                            * np.arange(s["nv"]) / s["nv"]),
                    cy + s["size"] * np.sin(ang + 2 * np.pi
                                            * np.arange(s["nv"]) / s["nv"]),
                ], axis=1).astype(np.int32)
                cv2.fillPoly(img, [pts], color)
            else:
                cv2.ellipse(img, (cx, cy),
                            (int(s["size"]), int(s["size"] * 0.6)),
                            float(np.degrees(s["phase"])) + 3 * t, 0, 360,
                            color, -1)
        out[t] = np.clip(img, 0, 255).astype(np.uint8)
    return out


def _make_warped_clip(rng: np.random.Generator, frames: int, h: int,
                      w: int, mode: int) -> np.ndarray:
    """Subpixel-motion clips (modes 1-3 of make_train_frames)."""
    import cv2

    pad = 1.35  # canvas margin so affine drift never exposes the border
    ch, cw = int(h * pad), int(w * pad)
    if mode == 1:
        canvas = _mosaic_texture(rng, ch, cw)
    elif mode == 2:
        canvas = _plaid_texture(rng, ch, cw)
    else:
        ramp_y = np.linspace(0, 1, ch, dtype=np.float32)[:, None, None]
        ramp_x = np.linspace(0, 1, cw, dtype=np.float32)[None, :, None]
        c0, c1, c2 = (rng.uniform(0, 1, 3).astype(np.float32)
                      for _ in range(3))
        canvas = c0 * (1 - ramp_y) + c1 * ramp_y * (1 - ramp_x) \
            + c2 * ramp_x
        for _ in range(int(rng.integers(2, 6))):
            ctr = rng.integers(10, min(ch, cw) - 10, 2)
            verts = (ctr + rng.integers(-max(h // 6, 8), max(h // 6, 8) + 1,
                                        (int(rng.integers(3, 7)), 2)))
            cv2.fillPoly(canvas, [verts.astype(np.int32)],
                         rng.uniform(0, 1, 3).tolist())
    canvas = np.ascontiguousarray(canvas, np.float32)

    # Global affine drift: per-clip constant velocity in translation /
    # rotation / log-zoom, sampled small enough that frame t stays inside
    # the padded canvas. Warp is SUBPIXEL (INTER_LINEAR resampling).
    tvx, tvy = rng.uniform(-1.6, 1.6, 2)
    if mode == 2:
        rot_v, zoom_v = 0.0, 0.0   # pure subpixel translation
    else:
        rot_v = rng.uniform(-0.5, 0.5)          # deg / frame
        zoom_v = rng.uniform(-0.003, 0.003)     # log-zoom / frame
    cx, cy = cw / 2, ch / 2
    bright_v = rng.uniform(-0.002, 0.002)

    # Sprites with subpixel velocities (drawn pre-warp so they inherit
    # the resampling).
    n_sp = int(rng.integers(0, 4)) if mode != 2 else 0
    sprites = [{
        "pos": rng.uniform([0, 0], [cw, ch]),
        "vel": rng.uniform(-2.5, 2.5, 2),
        "size": rng.uniform(h / 14, h / 5),
        "color": rng.uniform(0.05, 1.0, 3),
    } for _ in range(n_sp)]

    out = np.empty((frames, h, w, 3), np.uint8)
    y0, x0 = (ch - h) // 2, (cw - w) // 2
    for t in range(frames):
        img = canvas.copy()
        for s in sprites:
            px, py = s["pos"] + s["vel"] * t
            cv2.circle(img, (int(px) % cw, int(py) % ch),
                       int(s["size"]), s["color"].tolist(), -1,
                       lineType=cv2.LINE_AA)
        ang = rot_v * t
        z = float(np.exp(zoom_v * t))
        M = cv2.getRotationMatrix2D((cx, cy), ang, z)
        M[0, 2] += tvx * t
        M[1, 2] += tvy * t
        warped = cv2.warpAffine(img, M, (cw, ch),
                                flags=cv2.INTER_LINEAR,
                                borderMode=cv2.BORDER_REFLECT)
        crop = warped[y0:y0 + h, x0:x0 + w] * (1.0 + bright_v * t)
        out[t] = np.clip(crop * 255.0, 0, 255).astype(np.uint8)
    return out


def _make_flow_clip(rng: np.random.Generator, frames: int, h: int,
                    w: int) -> np.ndarray:
    """Mode 4 of make_train_frames: non-rigid subpixel motion everywhere.

    A composite texture canvas is advected by a per-pixel constant
    velocity field (Gaussian-blurred white noise, i.e. a smooth random
    flow) while an integrated-random-walk camera pans the crop. Every
    output pixel is produced by cv2.remap resampling each frame."""
    import cv2

    pad = 1.3
    ch, cw = int(h * pad), int(w * pad)
    slope = rng.uniform(0.8, 2.0)
    mix = rng.uniform(0.25, 0.75)
    canvas = np.stack([
        mix * _spectral_texture(rng, ch, cw, slope)
        + (1 - mix) * _mosaic_texture(rng, ch, cw)[..., c]
        for c in range(3)
    ], axis=-1).astype(np.float32)
    canvas *= rng.uniform(0.5, 1.0, (1, 1, 3)).astype(np.float32)

    # Smooth random flow: blur white noise to ~h/6 correlation length,
    # scale to a subpixel per-frame velocity.
    vmax = rng.uniform(0.3, 1.4)  # px / frame
    sig = max(h, w) / 6.0
    flow = np.stack([cv2.GaussianBlur(rng.standard_normal((ch, cw))
                                      .astype(np.float32), (0, 0), sig)
                     for _ in range(2)], axis=-1)
    flow *= vmax / max(np.abs(flow).max(), 1e-6)

    # Integrated-random-walk camera: velocity is a cumulative sum of small
    # kicks (direction changes over the clip, unlike a constant drift).
    kicks = rng.normal(0, 0.25, (frames, 2)).astype(np.float32)
    vel = np.cumsum(kicks, axis=0)
    cam = np.cumsum(vel, axis=0)
    cam -= cam.mean(axis=0, keepdims=True)
    lim = (min(ch - h, cw - w) / 2.0) * 0.9
    scale_cam = lim / max(np.abs(cam).max(), 1e-6)
    cam *= min(1.0, scale_cam)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    y0, x0 = (ch - h) // 2, (cw - w) // 2
    out = np.empty((frames, h, w, 3), np.uint8)
    for t in range(frames):
        mx = xx + x0 + cam[t, 0] + t * flow[y0:y0 + h, x0:x0 + w, 0]
        my = yy + y0 + cam[t, 1] + t * flow[y0:y0 + h, x0:x0 + w, 1]
        fr = cv2.remap(canvas, mx.astype(np.float32),
                       my.astype(np.float32), cv2.INTER_LINEAR,
                       borderMode=cv2.BORDER_REFLECT)
        out[t] = np.clip(fr * 255.0, 0, 255).astype(np.uint8)
    return out


def make_pairs(frames: np.ndarray, batch: int, clip_len: int,
               crop: int, scale: int, seed: int = 0,
               compound_p: float = 0.0, wide: bool = False,
               chain_p: float = 0.0, wide_p: float = 0.0) -> dict:
    """Sample a batch of (lr, hr) clip pairs from source frames.

    frames: (N, H, W, 3) uint8 or float. Returns numpy dict
    {"lr": (B,T,h,w,3), "hr": (B,T,H,W,3)} float32 in [0,1].

    ``compound_p``: probability of a SECOND degradation pass on the LR
    (``_degrade`` at scale 1 — blur/noise/quant/jpeg stacked on the first
    draw). Training-only knob (pair_iterator sets it): with independent
    per-op draws a stacked chain is a ~3% event, so models never learned
    compound captures — the measured cause of the negative transfer to
    the compound-chain alt eval family (train/evalgen.py). The default 0
    keeps the held-out ``ind`` eval (evalsuite) byte-stable."""
    rng = np.random.default_rng(seed)
    if frames.dtype == np.uint8:
        frames = frames.astype(np.float32) / 255.0
    n, H, W, _ = frames.shape
    assert n >= clip_len, "need at least clip_len source frames"
    hr = np.empty((batch, clip_len, crop, crop, 3), np.float32)
    lr = np.empty((batch, clip_len, crop // scale, crop // scale, 3),
                  np.float32)
    for b in range(batch):
        t0 = rng.integers(0, n - clip_len + 1)
        y = rng.integers(0, max(H - crop, 1))
        x = rng.integers(0, max(W - crop, 1))
        clip_hr = frames[t0:t0 + clip_len, y:y + crop, x:x + crop]
        hr[b] = clip_hr
        # Per-clip pipeline mixture (training-only knobs; the eval keeps
        # the defaults = pure non-wide _degrade):
        #   chain_p  -> the always-compound third family (_degrade_chain)
        #   wide_p   -> the wide-severity randomized tier
        #   else     -> the canonical randomized chain (the ind family)
        # No mixture draw on the default path: the eval realizations are
        # pinned to the canonical RNG stream (see
        # test_eval_degradation_realizations_pinned).
        draw = rng.random() if (chain_p or wide_p) else 1.0
        if draw < chain_p:
            lr[b] = _degrade_chain(clip_hr, scale, rng)
        elif draw < chain_p + wide_p or wide:
            lr[b] = _degrade(clip_hr, scale, rng, wide=True)
        else:
            lr[b] = _degrade(clip_hr, scale, rng)
        if compound_p and rng.random() < compound_p:
            lr[b] = _degrade(lr[b], 1, rng)
    return {"lr": lr, "hr": hr}


def pair_iterator(frames: np.ndarray, batch: int, clip_len: int, crop: int,
                  scale: int, seed: int = 0, compound_p: float = 0.25,
                  chain_p: float = 0.3, wide_p: float = 0.2):
    """Infinite iterator of training batches. The round-5 mixture: 50%
    canonical draws (anchors the in-distribution eval — an all-wide bank
    measurably hurt BOTH eval families, see _degrade_chain docstring),
    30% always-compound chain family, 20% wide-severity tier, plus an
    independent 25% second-pass stack. All training-only; make_pairs
    defaults (the eval path) are untouched."""
    step = 0
    while True:
        yield make_pairs(frames, batch, clip_len, crop, scale,
                         seed=seed + step, compound_p=compound_p,
                         chain_p=chain_p, wide_p=wide_p)
        step += 1


def make_triplets(frames: np.ndarray, batch: int, crop: int,
                  seed: int = 0) -> dict:
    """Frame-interpolation triplets: ``lr`` = the two endpoint frames
    (B, 2, c, c, 3), ``hr`` = the true middle frame (B, 1, c, c, 3)."""
    rng = np.random.default_rng(seed)
    if frames.dtype == np.uint8:
        frames = frames.astype(np.float32) / 255.0
    n, H, W, _ = frames.shape
    assert n >= 3, "need at least 3 source frames"
    lr = np.empty((batch, 2, crop, crop, 3), np.float32)
    hr = np.empty((batch, 1, crop, crop, 3), np.float32)
    for b in range(batch):
        t0 = rng.integers(0, n - 2)
        y = rng.integers(0, max(H - crop, 1))
        x = rng.integers(0, max(W - crop, 1))
        win = frames[t0:t0 + 3, y:y + crop, x:x + crop]
        lr[b, 0], lr[b, 1] = win[0], win[2]
        hr[b, 0] = win[1]
    return {"lr": lr, "hr": hr}


def triplet_iterator(frames: np.ndarray, batch: int, crop: int,
                     seed: int = 0):
    step = 0
    while True:
        yield make_triplets(frames, batch, crop, seed=seed + step)
        step += 1
