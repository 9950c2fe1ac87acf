"""Warm start: build every handler and run a tiny forward to fill the
persistent compile cache (reference warm_start.py:17-48 builds all 4
handlers and runs a dummy (1,3,3,64,64) forward).

Run: ``python -m video_enhancer_tpu.warm_start [--platform cpu]``
"""

from __future__ import annotations

import argparse
import time


def warm_start(models: list[str] | None = None, size: int = 64,
               frames: int = 4) -> dict:
    import jax.numpy as jnp
    import numpy as np

    from .runtime.registry import build_handler, probe_available

    clip = jnp.asarray(
        np.random.default_rng(0).random((frames, size, size, 3), np.float32)
    )
    results = {}
    for name in sorted(models or probe_available()):
        t0 = time.time()
        try:
            h = build_handler(name)
            if hasattr(h, "process_clip"):
                out = h.process_clip(clip)
            else:
                out = h.enhance_frames(clip)
            out.block_until_ready()
            results[name] = {"ok": True, "sec": round(time.time() - t0, 2),
                             "out_shape": list(out.shape)}
        except Exception as e:
            results[name] = {"ok": False, "error": str(e)}
        print(f"warm {name}: {results[name]}")
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--models", nargs="*", default=None)
    p.add_argument("--size", type=int, default=64)
    args = p.parse_args(argv)

    from .utils.jaxenv import setup

    setup(platform=args.platform)
    results = warm_start(models=args.models, size=args.size)
    ok = sum(1 for r in results.values() if r["ok"])
    print(f"warm start: {ok}/{len(results)} models ready")
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
