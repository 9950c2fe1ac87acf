"""Pareto retrain gate for scripts/retrain_r5d.sh (train-through-
calibration chunks).

Accept a freshly exported bundled npz iff ALL of:
  - ind >= IND_FLOOR and alt >= ALT_FLOOR — the CI gates
    (tests/test_bundled_weights.py GATES), so an accepted chunk can never
    fail CI; for the five positive-alt models ALT_FLOOR=0.0 keeps the
    strictly-positive cross-generator claim;
  - ind + alt improves vs the pre-train snapshot — net movement toward
    "actually good", allowing a small alt give-back for a large ind gain
    (dualgate.py's alt-must-improve rule would revert that trade).

The eval is deterministic (fixed seed set), so comparisons are exact,
not noise. Exit 0 = accept, 1 = revert. Prints one JSON line either way.

Usage: python scripts/paretogate.py MODEL SNAPSHOT_NPZ IND_FLOOR ALT_FLOOR
"""

import json
import sys

from video_enhancer_tpu.utils.jaxenv import setup

setup()


def main(argv):
    model, snap = argv[0], argv[1]
    ind_floor, alt_floor = float(argv[2]), float(argv[3])
    from video_enhancer_tpu.train.evalsuite import bundled_gain, gain_for_npz

    n = 6
    out = {
        "model": model,
        "ind": round(bundled_gain(model, "ind", n_seeds=n), 3),
        "alt": round(bundled_gain(model, "alt", n_seeds=n), 3),
        "snap_ind": round(gain_for_npz(model, snap, "ind", n_seeds=n), 3),
        "snap_alt": round(gain_for_npz(model, snap, "alt", n_seeds=n), 3),
        "ind_floor": ind_floor,
        "alt_floor": alt_floor,
    }
    ok = (out["ind"] >= ind_floor and out["alt"] >= alt_floor
          and out["ind"] + out["alt"] > out["snap_ind"] + out["snap_alt"])
    out["verdict"] = "accept" if ok else "revert"
    print(json.dumps(out), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
