"""Calibrated output-strength probe for 4x VSR models (no retraining).

out = alpha * model(lr) + (1 - alpha) * bicubic(lr). Shrinkage toward the
non-ML baseline: if a model's cross-generator (alt) error is partially
orthogonal to bicubic's, some alpha < 1 measures positive on alt even
when alpha=1 is negative — at a proportional cost to the in-distribution
gain. Measures both families per alpha so the tradeoff is explicit.

Usage: VETPU_PLATFORM=cpu python scripts/vsr_strength_sweep.py MODEL [ALPHAS]
"""

import json
import sys

from video_enhancer_tpu.utils.jaxenv import setup

setup()

import jax.numpy as jnp  # noqa: E402

from video_enhancer_tpu.ops import resize  # noqa: E402
from video_enhancer_tpu.runtime.weights import try_load_params  # noqa: E402
from video_enhancer_tpu.train.evalsuite import (  # noqa: E402
    WEIGHTS_DIR, model_entry, vsr_gain)


def main():
    import os

    name = sys.argv[1]
    alphas = ([float(a) for a in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [0.5, 0.7, 0.85, 1.0])
    # Sweep the RAW model: model_entry bakes in the shipped calibrated
    # strength (runtime/calibration.py), which would compose with the
    # swept alpha.
    os.environ[f"VETPU_STRENGTH_{name.upper()}"] = "1.0"
    init_fn, apply_fn, npz, kind = model_entry(name)
    assert kind in ("vsr4", "vsr2"), f"{name} is not a VSR entry"
    scale = 4 if kind == "vsr4" else 2
    params = try_load_params(npz, init_fn())
    assert params is not None

    def blended(alpha):
        def fn(p, x):
            out = apply_fn(p, x)
            base = jnp.clip(
                resize(x, (out.shape[2], out.shape[3]), method="cubic"),
                0, 1)
            return jnp.clip(alpha * out + (1.0 - alpha) * base, 0.0, 1.0)
        return fn

    for alpha in alphas:
        row = {"model": name, "alpha": alpha}
        for family in ("ind", "alt"):
            row[family] = round(
                vsr_gain(blended(alpha), params, family, scale,
                         n_seeds=6), 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
