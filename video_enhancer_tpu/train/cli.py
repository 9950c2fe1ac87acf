"""Training CLI.

``python -m video_enhancer_tpu.train.cli --model cnn_upscaler --steps 200``

Trains a model on synthetic degradation pairs over a named mesh, with orbax
checkpointing (resume with the same --ckpt-dir) and a final npz export that
the inference registry loads via the policy's weight chain.
"""

from __future__ import annotations

import argparse
import json
import time


#: model -> calibration wrapper kind (runtime/calibration.py). seedvr2 is
#: absent: its strength lives inside models/seedvr2.apply already.
_CAL_KIND = {
    "cnn_upscaler": "vsr", "fast_mamba_vsr": "vsr", "vsrm": "vsr",
    "realesrgan": "vsr", "rvrt": "vsr", "ditvr": "restore", "rife": "interp",
}


def _through_calibration(name: str, cal_name: str, apply_clip, interp_fn):
    """Wrap the training apply with the SERVED calibrated output strength
    (runtime/calibration.py) so the loss optimizes exactly what serving
    and the eval gates measure: ``s*model(x) + (1-s)*fallback(x)``. This
    is the seedvr2 pattern (models/seedvr2.py trains through its internal
    blend) generalized to the zoo; at s<1 the raw-output loss and the
    served-output loss are different objectives, and round-5 measured the
    gap (BENCH_RESULTS.md round-5 calibration log)."""
    from ..runtime import calibration as cal

    kind = _CAL_KIND.get(name)
    if kind == "interp":
        mid_fn = cal.calibrate_interp(cal_name, interp_fn)

        def apply_pair_clip(p, clip):
            return mid_fn(p, clip[:, 0], clip[:, 1])[:, None]

        return apply_pair_clip
    if kind == "restore":
        return cal.calibrate_restore(cal_name, apply_clip)
    if kind == "vsr":
        return cal.calibrate_vsr(cal_name, apply_clip)
    return apply_clip


def build_model(name: str, scale: int, dim: int | None = None,
                layers: int | None = None, heads: int | None = None,
                temporal_mixer: str = "ssm",
                cal_name: str | None = None):
    """cal_name: train THROUGH the served calibrated output strength of
    that model name (e.g. 'realesrgan_fast' while --model realesrgan
    builds the half-trunk preset); None trains the raw model output."""
    import jax

    def wrap(apply_clip, interp_fn=None):
        if cal_name is None:
            return apply_clip
        return _through_calibration(name, cal_name, apply_clip, interp_fn)

    key = jax.random.PRNGKey(0)
    if name == "cnn_upscaler":
        from ..models import upscaler

        params, meta = upscaler.init(key, features=dim or 128, scale=scale,
                                     s2d=4)

        def apply_clip(p, clip):
            b, t = clip.shape[0], clip.shape[1]
            frames = clip.reshape((b * t,) + clip.shape[2:])
            out = upscaler.apply(p, frames, scale=scale, s2d=4)
            return out.reshape((b, t) + out.shape[1:])

        return params, wrap(apply_clip)
    if name == "fast_mamba_vsr":
        from ..models import fast_mamba_vsr as m

        params, meta = m.init(key, dim=dim or 48, num_layers=layers or 8,
                              scale=scale, temporal_mixer=temporal_mixer)
        return params, wrap(lambda p, c: m.apply(p, c, scale=scale))
    if name == "vsrm":
        from ..models import vsrm as m

        params, meta = m.init(key, dim=dim or 64, num_blocks=layers or 6,
                              scale=scale)
        return params, wrap(lambda p, c: m.apply(p, c, scale=scale))
    if name == "realesrgan":
        from ..models import realesrgan as m

        params, meta = m.init(key, features=dim or 64,
                              num_blocks=layers or 6)

        def apply_clip(p, clip):
            b, t = clip.shape[0], clip.shape[1]
            frames = clip.reshape((b * t,) + clip.shape[2:])
            out = m.apply(p, frames, scale=scale)
            return out.reshape((b, t) + out.shape[1:])

        return params, wrap(apply_clip)
    if name == "seedvr2":
        from ..models import seedvr2 as m

        params, meta = m.init(key, base_channels=dim or 32)
        return params, lambda p, c: m.apply(p, c)
    if name == "ditvr":
        from ..models import ditvr as m

        # heads is a pure layout knob: dh = dim/heads, param shapes
        # unchanged — heads=3 (dh=128, full MXU lane width) is the fast
        # serving config (flash at dh=32 measured 3.8x slower than dh=128).
        h = heads or 6
        params, meta = m.init(key, dim=dim or 384, depth=layers or 8,
                              heads=h)
        return params, wrap(lambda p, c: m.apply(p, c, heads=h))
    if name == "rvrt":
        from ..models import rvrt as m

        params, meta = m.init(key, dim=dim or 64, depth=layers or 4,
                              scale=scale)
        return params, wrap(lambda p, c: m.apply(p, c, scale=scale))
    if name == "rife":
        from ..models import rife as m

        params, meta = m.init(key, dim=dim or 32, levels=layers or 3)

        def apply_pair_clip(p, clip):
            # clip: (B, 2, H, W, 3) = the two endpoint frames; predict the
            # midpoint as a length-1 clip.
            mid = m.interpolate_pair(p, clip[:, 0], clip[:, 1])
            return mid[:, None]

        return params, wrap(apply_pair_clip, interp_fn=m.interpolate_pair)
    raise SystemExit(f"unsupported trainable model: {name}")


def _prefetch(it, depth: int = 2):
    """Run the host-side batch generator in a daemon thread so degradation
    synthesis (cv2 blurs/JPEG round-trips in train/data._degrade — ~1 s a
    batch on this 1-core host after the round-5 widening) overlaps the
    device step instead of serializing with it. Measured round 5: seedvr2
    went 1.0 -> 2.1 s/step when the widened bank landed; the device step
    itself is ~1 s."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # surface generator failures to the consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if isinstance(item, BaseException):
            raise item
        yield item


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="cnn_upscaler",
                   choices=["cnn_upscaler", "fast_mamba_vsr", "vsrm",
                            "realesrgan", "seedvr2", "ditvr", "rvrt",
                            "rife"])
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--clip-len", type=int, default=4)
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--scale", type=int, default=2)
    p.add_argument("--dim", type=int, default=None)
    p.add_argument("--layers", type=int, default=None)
    p.add_argument("--heads", type=int, default=None)
    p.add_argument("--temporal-mixer", default="ssm",
                   choices=["ssm", "ssd"],
                   help="fast_mamba_vsr only: temporal layer family")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--source", default=None,
                   help="video file for training frames (default: synthetic)")
    p.add_argument("--content", default="mixed", choices=["mixed", "demo"],
                   help="synthetic content bank (mixed = demo + spectral/"
                        "sprite clips; round-3 weights used demo only)")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--init-npz", default=None,
                   help="warm-start weights from an exported npz")
    p.add_argument("--export", default=None, help="final npz weights path")
    p.add_argument("--mesh-data", type=int, default=1)
    p.add_argument("--mesh-time", type=int, default=1)
    p.add_argument("--mesh-space", type=int, default=1)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--through-calibration", default=None, metavar="NAME",
                   help="train THROUGH the served calibrated output "
                        "strength of this model name (runtime/"
                        "calibration.py), so the loss optimizes exactly "
                        "what serving and the eval gates measure; e.g. "
                        "'vsrm', or 'realesrgan_fast' while --model "
                        "realesrgan builds the half-trunk preset. "
                        "Default: raw model output (pre-round-5 "
                        "behavior).")
    p.add_argument("--correction-penalty", type=float, default=0.0,
                   metavar="LAMBDA",
                   help="L2 penalty on the served output's distance from "
                        "the model's non-ML fallback (bicubic / input / "
                        "pair average per kind). Adaptive shrinkage: the "
                        "optimizer keeps corrections that reduce fit loss "
                        "more than LAMBDA * magnitude and suppresses the "
                        "low-signal (family-specific) rest — the recorded "
                        "fix attempt for the r5d through-calibration alt "
                        "collapse (vsrm alt +0.008 -> -0.432 at "
                        "LAMBDA=0).")
    p.add_argument("--time-budget-s", type=float, default=None,
                   help="stop training cleanly after this many seconds "
                        "(checkpoint + export still run; resumable via "
                        "--ckpt-dir)")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    from ..utils.jaxenv import setup

    setup(platform=args.platform)

    import jax
    import numpy as np

    from ..parallel.mesh import make_mesh
    from .checkpoint import export_params, restore_checkpoint, save_checkpoint
    from .data import pair_iterator, triplet_iterator
    from .step import make_optimizer, make_train_step

    if args.source:
        from ..io.video import read_video

        frames = read_video(args.source)
    elif args.content == "demo":
        from ..io.demo import make_demo_frames

        frames = make_demo_frames(64, (args.crop * 2, args.crop * 2))
    else:
        # Mixed content bank: demo generator + spectral-noise/sprite clips
        # (round 4: single-generator training measured negative gains on
        # the cross-generator eval family — scripts/crossgen_eval.py).
        from ..io.demo import make_demo_frames
        from .data import make_train_frames

        size = (args.crop * 2, args.crop * 2)
        # One bank per content/motion mode (x2 seeds): spectral+sprites,
        # mosaic/affine-drift, plaid/subpixel-pan, gradient+polygons,
        # flow-field warp (round 5, non-rigid subpixel motion everywhere).
        frames = np.concatenate(
            [make_demo_frames(64, size)]
            + [make_train_frames(48, size, seed=s, mode=s % 5)
               for s in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)],
            axis=0)

    params, apply_clip = build_model(args.model, args.scale, dim=args.dim,
                                     layers=args.layers, heads=args.heads,
                                     temporal_mixer=args.temporal_mixer,
                                     cal_name=args.through_calibration)
    if args.init_npz:
        from ..runtime.weights import try_load_params

        warm = try_load_params(args.init_npz, params)
        if warm is not None:
            params = warm
            print(f"warm-started from {args.init_npz}")
        else:
            print(f"warm-start failed for {args.init_npz}; random init")
    optimizer = make_optimizer(lr=args.lr)
    mesh = make_mesh(args.mesh_data, args.mesh_time, args.mesh_space)
    step_kw = {}
    if args.correction_penalty > 0.0:
        import jax.numpy as jnp

        from ..ops import resize
        from .losses import vsr_loss

        kind = _CAL_KIND.get(args.model, "vsr")
        lam = float(args.correction_penalty)

        def _fallback(lr_clip, pred):
            if kind == "restore":
                return lr_clip
            if kind == "interp":  # pair -> midpoint fallback = average
                return jnp.mean(lr_clip, axis=1, keepdims=True)
            base = resize(lr_clip, (pred.shape[-3], pred.shape[-2]),
                          method="cubic")
            return jnp.clip(base, 0.0, 1.0)

        def penalized_loss(pred, hr, lr):
            base = _fallback(lr, pred).astype(pred.dtype)
            pen = jnp.mean((pred - base) ** 2)
            return vsr_loss(pred, hr) + lam * pen

        step_kw["loss_fn"] = penalized_loss
    init_state, train_step, shard_batch = make_train_step(
        apply_clip, optimizer, mesh, **step_kw
    )

    if args.model == "rife":
        it = triplet_iterator(frames, args.batch, args.crop)
    else:
        it = pair_iterator(frames, args.batch, args.clip_len, args.crop,
                           args.scale)
    it = _prefetch(it, depth=2)
    with mesh:
        state = init_state(params)
        if args.ckpt_dir:
            restored = restore_checkpoint(args.ckpt_dir, state)
            if restored is not None:
                state = restored
                print(f"resumed from step {int(state.step)}")
        t0 = time.time()
        losses = []
        start = int(state.step)
        pending = []  # device-side losses; fetched only at log points so
        # the step loop never blocks on a device->host sync (the fetch
        # costs ~2 s/step through a TPU tunnel, dwarfing the step itself).
        for i in range(start, args.steps):
            batch = shard_batch(next(it))
            state, metrics = train_step(state, batch)
            pending.append(metrics["loss"])
            if (i + 1) % args.log_every == 0:
                fetched = [float(v) for v in jax.device_get(pending)]
                losses.extend(fetched)
                pending = []
                avg = sum(fetched) / len(fetched)
                print(json.dumps({
                    "step": i + 1, "loss": round(avg, 5),
                    "sec_per_step": round((time.time() - t0) /
                                          max(i + 1 - start, 1), 3),
                }))
            # Budget check every iteration (cheap — no device sync), not
            # only at log points: a slow step could otherwise overshoot by
            # up to log_every steps, and a run with steps < log_every would
            # never stop early at all.
            if (args.time_budget_s is not None
                    and time.time() - t0 > args.time_budget_s):
                print(f"time budget {args.time_budget_s}s reached at "
                      f"step {i + 1}; stopping early")
                break
        losses.extend(float(v) for v in jax.device_get(pending))
        if args.ckpt_dir:
            step = save_checkpoint(args.ckpt_dir, state)
            print(f"checkpoint saved at step {step}")
        if args.export:
            path = export_params(args.export, state)
            print(f"weights exported to {path}")
    if losses:
        print(json.dumps({"final_loss": round(losses[-1], 5),
                          "first_loss": round(losses[0], 5)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
