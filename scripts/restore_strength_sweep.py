"""Calibrated output-strength probe for 1x restore models (ditvr).

Same shrinkage as scripts/seedvr2_blend_sweep.py but generic over the
evalsuite "restore" entries: out = alpha * model(x) + (1 - alpha) * x,
measured on both eval families per alpha.

Usage: VETPU_PLATFORM=cpu python scripts/restore_strength_sweep.py MODEL [ALPHAS]
"""

import json
import sys

from video_enhancer_tpu.utils.jaxenv import setup

setup()

import jax.numpy as jnp  # noqa: E402

from video_enhancer_tpu.runtime.weights import try_load_params  # noqa: E402
from video_enhancer_tpu.train.evalsuite import (  # noqa: E402
    model_entry, restore_gain)


def main():
    import os

    name = sys.argv[1]
    alphas = ([float(a) for a in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [0.3, 0.5, 0.7, 1.0])
    # Sweep the RAW model (see vsr_strength_sweep.py).
    os.environ[f"VETPU_STRENGTH_{name.upper()}"] = "1.0"
    init_fn, apply_fn, npz, kind = model_entry(name)
    assert kind == "restore", f"{name} is not a restore entry"
    params = try_load_params(npz, init_fn())
    assert params is not None

    def blended(alpha):
        def fn(p, x):
            out = apply_fn(p, x)
            return jnp.clip(alpha * out + (1.0 - alpha) * x, 0.0, 1.0)
        return fn

    for alpha in alphas:
        row = {"model": name, "alpha": alpha}
        for family in ("ind", "alt"):
            row[family] = round(
                restore_gain(blended(alpha), params, family, n_seeds=6), 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
