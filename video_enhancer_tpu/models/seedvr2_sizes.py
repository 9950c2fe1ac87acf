"""SeedVR2 size aliases (reference
models/enhancement/zeroshot/seedvr2_models.py:34-106: SeedVR2_3B / SeedVR2_7B
subclasses + factories; config table at ditvr_handler.py:372-387).

The 3B/7B variants are DiTVR-backbone restorers at the published sizes.
Factories return (params, meta, apply) triples; beware that 3B/7B parameter
trees are tens of GB — they are meant for pod-scale meshes, not single-chip
tests (use "small"/"base" presets there).
"""

from __future__ import annotations

import jax

from . import ditvr

__all__ = ["make_seedvr2_3b", "make_seedvr2_7b", "make_seedvr2"]


def make_seedvr2(size: str = "small", key=None):
    cfg = ditvr.SIZE_PRESETS[size]
    key = key if key is not None else jax.random.PRNGKey(0)
    params, meta = ditvr.init(key, dim=cfg["dim"], depth=cfg["depth"],
                              heads=cfg["heads"])
    meta = dict(meta, preset=size)

    def apply(p, clip, **kw):
        return ditvr.apply(p, clip, heads=cfg["heads"], **kw)

    return params, meta, apply


def make_seedvr2_3b(key=None):
    return make_seedvr2("3b", key)


def make_seedvr2_7b(key=None):
    return make_seedvr2("7b", key)
