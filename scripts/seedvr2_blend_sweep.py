"""Sweep an output-blend strength for seedvr2 (no retraining).

restored_blend = alpha * model(x) + (1 - alpha) * x. If the model's
residual error is partially orthogonal to the input degradation, some
alpha < 1 can measure positive even when alpha=1 is negative — the
classic "strength" control real diffusion restorers ship. Measures mean
PSNR gain on both eval families per alpha.

Usage: VETPU_PLATFORM=cpu python scripts/seedvr2_blend_sweep.py
"""

import json

from video_enhancer_tpu.utils.jaxenv import setup

setup()

import jax.numpy as jnp  # noqa: E402

from video_enhancer_tpu.models import seedvr2  # noqa: E402
from video_enhancer_tpu.runtime.weights import try_load_params  # noqa: E402
from video_enhancer_tpu.train.evalsuite import (  # noqa: E402
    WEIGHTS_DIR, model_entry, restore_gain)


def main():
    init_fn = model_entry("seedvr2")[0]
    params = try_load_params(WEIGHTS_DIR / "seedvr2_1x.npz", init_fn())
    assert params is not None

    def blended(alpha):
        def fn(p, x):
            out = seedvr2.apply(p, x)
            return jnp.clip(alpha * out + (1.0 - alpha) * x, 0.0, 1.0)
        return fn

    for alpha in [0.15, 0.3, 0.5, 0.75, 1.0]:
        row = {"alpha": alpha}
        for family in ("ind", "alt"):
            row[family] = round(
                restore_gain(blended(alpha), params, family, n_seeds=6), 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
