#!/usr/bin/env python
"""Measure every bundled model's held-out gain on BOTH synthetic families:
in-distribution (io/demo.py + train/data._degrade — the training family)
and cross-generator (train/evalgen.py — structurally disjoint textures,
motion, and degradations). Prints one JSON line per model. Used to set the
quality gates in tests/test_bundled_weights.py (round-4 verdict item 3).

Gains are means over --n-seeds independently drawn batches
(train/evalsuite.py): the widened randomized degradation pipeline makes
single-batch numbers noise-dominated (one unlucky draw swings ±1 dB).
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from video_enhancer_tpu.utils.jaxenv import setup

setup()

MODELS = ["vsrm", "realesrgan", "rvrt", "fast_mamba_vsr", "ditvr",
          "seedvr2", "rife", "cnn_upscaler"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-seeds", type=int, default=8)
    ap.add_argument("--models", nargs="*", default=MODELS)
    args = ap.parse_args()

    from video_enhancer_tpu.train.evalsuite import bundled_gain

    for name in args.models:
        row = {"model": name}
        for family, key in (("ind", "ind_db"), ("alt", "alt_db")):
            try:
                row[key] = round(bundled_gain(name, family,
                                              n_seeds=args.n_seeds), 3)
            except FileNotFoundError:
                row[key] = None
            except Exception as e:  # keep the report complete
                row[key] = f"error: {str(e)[:120]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
