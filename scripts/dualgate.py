"""Dual-family retrain gate for scripts/retrain_r5c.sh.

Accept a freshly exported bundled npz iff BOTH:
  - alt (cross-generator) mean gain improved vs the pre-train snapshot —
    the round-5 target axis (every alt gate is still None, VERDICT item 5);
  - ind mean gain stays at or above the model's CI gate
    (tests/test_bundled_weights.py GATES), so an alt win can never ship an
    ind regression past CI.

Exit 0 = accept, 1 = revert. Prints one JSON line either way.

Usage: python scripts/dualgate.py MODEL SNAPSHOT_NPZ IND_FLOOR
"""

import json
import sys

from video_enhancer_tpu.utils.jaxenv import setup

setup()


def main(argv):
    model, snap, floor = argv[0], argv[1], float(argv[2])
    from video_enhancer_tpu.train.evalsuite import bundled_gain, gain_for_npz

    n = 6
    out = {
        "model": model,
        "ind": round(bundled_gain(model, "ind", n_seeds=n), 3),
        "alt": round(bundled_gain(model, "alt", n_seeds=n), 3),
        "snap_alt": round(gain_for_npz(model, snap, "alt", n_seeds=n), 3),
        "ind_floor": floor,
    }
    ok = out["alt"] > out["snap_alt"] and out["ind"] >= floor
    out["verdict"] = "accept" if ok else "revert"
    print(json.dumps(out), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
