"""Calibrated output-strength probe for frame interpolation (rife).

Same shrinkage as scripts/vsr_strength_sweep.py, toward interpolation's
non-ML fallback: out = alpha * model(f0, f1) + (1 - alpha) * (f0+f1)/2,
measured on both eval families per alpha.

Usage: VETPU_PLATFORM=cpu python scripts/interp_strength_sweep.py [ALPHAS]
"""

import json
import sys

from video_enhancer_tpu.utils.jaxenv import setup

setup()

import jax.numpy as jnp  # noqa: E402

from video_enhancer_tpu.runtime.weights import try_load_params  # noqa: E402
from video_enhancer_tpu.train.evalsuite import (  # noqa: E402
    interp_gain, model_entry)


def main():
    import os

    alphas = ([float(a) for a in sys.argv[1].split(",")]
              if len(sys.argv) > 1 else [0.4, 0.6, 0.8, 1.0])
    # Sweep the RAW model (see vsr_strength_sweep.py).
    os.environ["VETPU_STRENGTH_RIFE"] = "1.0"
    init_fn, apply_fn, npz, kind = model_entry("rife")
    assert kind == "interp"
    params = try_load_params(npz, init_fn())
    assert params is not None

    def blended(alpha):
        def fn(p, f0, f1):
            out = apply_fn(p, f0, f1)
            return jnp.clip(
                alpha * out + (1.0 - alpha) * (f0 + f1) / 2, 0.0, 1.0)
        return fn

    for alpha in alphas:
        row = {"model": "rife", "alpha": alpha}
        for family in ("ind", "alt"):
            row[family] = round(
                interp_gain(blended(alpha), params, family, n_seeds=6), 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
