"""Sweep the seedvr2 one-step timestep cap (no retraining).

The one-step x0 recovery amplifies UNet eps error by
sqrt(1-abar)/sqrt(abar); at t -> 1 the model degenerates to passthrough +
the temporal-consistency module. This measures the bundled weights' mean
PSNR gain on both eval families at a range of caps to find the serving
operating point (reference analog: the fixed t=500 choice at
/root/reference/models/enhancement/zeroshot/seedvr2_handler.py:108-110,
which the reference never validates because its weights never load).

Usage: VETPU_PLATFORM=cpu python scripts/seedvr2_tcap_sweep.py
"""

import functools
import json

from video_enhancer_tpu.utils.jaxenv import setup

setup()

from video_enhancer_tpu.models import seedvr2  # noqa: E402
from video_enhancer_tpu.runtime.weights import try_load_params  # noqa: E402
from video_enhancer_tpu.train.evalsuite import (  # noqa: E402
    WEIGHTS_DIR, model_entry, restore_gain)


def main():
    init_fn = model_entry("seedvr2")[0]
    params = try_load_params(WEIGHTS_DIR / "seedvr2_1x.npz", init_fn())
    assert params is not None
    for cap in [1.0, 25.0, 50.0, 100.0, 200.0, 350.0, 999.0]:
        row = {"t_cap": cap}
        for family in ("ind", "alt"):
            fn = functools.partial(seedvr2.apply, t_cap=cap)
            row[family] = round(
                restore_gain(lambda p, x: fn(p, x), params, family,
                             n_seeds=6), 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
