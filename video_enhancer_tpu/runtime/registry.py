"""Model/handler registry: build any enabled model's handler by name.

Replaces the reference's per-handler construction scattered across
``VideoEnhancementAgent.__init__`` (reference video_enhancer_sota.py:81-87)
and the app (reference app.py:626-751). Handlers are cached singletons;
weights load from the policy's resolved path when present, else random init
(the reference behaves the same — SURVEY.md §5 "Random-weights reality").
"""

from __future__ import annotations

import threading
from typing import Any

import jax

from ..config import Policy, default_policy

__all__ = ["build_handler", "available_models", "clear_cache"]

_cache: dict[str, Any] = {}
_lock = threading.Lock()


def available_models(policy: Policy | None = None) -> list[str]:
    policy = policy or default_policy()
    return policy.enabled_models()


# The released RealESRGAN_x4plus.pth graph shape (tests monkeypatch this
# to a tiny config to exercise the official serve path cheaply).
_OFFICIAL_RRDB_CFG = {"features": 64, "num_blocks": 23, "growth": 32}

_MODEL_MODULES = {
    "fast_mamba_vsr": "fast_mamba_vsr",
    "fast_mamba_vsr_ssd": "fast_mamba_vsr",
    "vsrm": "vsrm",
    "seedvr2": "seedvr2",
    "ditvr": "ditvr",
    "rvrt": "rvrt",
    "realesrgan": "realesrgan",
    "realesrgan_fast": "realesrgan",
    "cnn_upscaler": "upscaler",
    "bicubic": "upscaler",
}


def probe_available(policy: Policy | None = None, *,
                    include_disqualified: bool = False) -> set[str]:
    """Importable + policy-enabled + quality-qualified models (reference
    availability probing, degradation_router.py:72-108 does the same with
    torch imports; the measured-gain demotion is new surface — the
    reference never measures its own weights).

    ``include_disqualified=True`` returns the raw availability set, for
    explicit-request paths (``task.model_preference``) where qualification
    must not override user intent."""
    import importlib

    policy = policy or default_policy()
    out = set()
    for name in policy.enabled_models():
        mod = _MODEL_MODULES.get(name)
        if mod is None:
            continue
        try:
            importlib.import_module(f"video_enhancer_tpu.models.{mod}")
            out.add(name)
        except ImportError:
            pass
    if not include_disqualified:
        from .qualification import disqualified_models

        out -= disqualified_models()
    return out


def clear_cache() -> None:
    with _lock:
        _cache.clear()


def build_handler(name: str, policy: Policy | None = None, seed: int = 0):
    policy = policy or default_policy()
    with _lock:
        if name in _cache:
            return _cache[name]
        handler = _build(name, policy, seed)
        _cache[name] = handler
        return handler


def _load_or_init(name: str, entry, init_fn, variant: str = "", **kw):
    """Weight resolution chain: policy path -> bundled weights -> random
    init (reference vsrm_handler.py:260-410 chain, minus network downloads
    — no egress).

    ``variant`` (e.g. the vsrm spatial-mixer name for non-default mixers)
    is baked into the bundled filename, so a checkpoint trained for one
    architecture variant is never leniently merged into another — the
    round-2 advisor found the attentive mixer silently serving ssd-trained
    temporal/upsample weights over a random spatial mixer."""
    import pathlib

    key = jax.random.PRNGKey(abs(hash(name)) % (2**31))
    params, meta = init_fn(key, **kw)
    candidates = []
    if entry is not None and entry.weights_path:
        candidates.append(entry.weights_path)
    scale = entry.scale if entry is not None else kw.get("scale", 4)
    stem = f"{name}_{variant}" if variant else name
    candidates.append(
        pathlib.Path(__file__).resolve().parents[1] / "weights"
        / f"{stem}_{scale}x.npz"
    )
    from .weights import try_load_params

    for cand in candidates:
        if pathlib.Path(cand).exists():
            loaded = try_load_params(cand, params)
            if loaded is not None:
                return loaded, dict(meta, weights=str(cand))
    return params, meta


def _serving_mesh(policy: Policy):
    """Build the policy-configured inference mesh if devices allow."""
    cfg = policy.mesh
    if cfg.num_devices <= 1:
        return None
    if len(jax.devices()) < cfg.num_devices:
        return None
    from ..parallel.mesh import make_mesh

    return make_mesh(data=cfg.data, time=cfg.time, space=cfg.space)


def _build(name: str, policy: Policy, seed: int):
    from .calibration import calibrate_restore, calibrate_vsr
    from .vsr_handler import VSRHandler

    entry = policy.models.get(name)
    mesh = _serving_mesh(policy)

    if name in ("cnn_upscaler", "bicubic"):
        from .upscaler_handler import CnnUpscalerHandler

        scale = entry.scale if entry else 2
        weights = entry.weights_path if entry else None
        if weights is None and name == "cnn_upscaler":
            # Bundled trained weights, if present.
            import pathlib

            bundled = (pathlib.Path(__file__).resolve().parents[1]
                       / "weights" / "cnn_upscaler_2x.npz")
            if bundled.exists():
                weights = str(bundled)
        return CnnUpscalerHandler(scale=scale, use_cnn=name == "cnn_upscaler",
                                  seed=seed, weights_path=weights)

    if name in ("fast_mamba_vsr", "fast_mamba_vsr_ssd"):
        from ..models import fast_mamba_vsr as m

        dim = int(entry.extra.get("dim", 48)) if entry else 48
        layers = int(entry.extra.get("num_layers", 8)) if entry else 8
        # Temporal-mixer preset: "ssm" (default) or "ssd" (MXU-form
        # recurrence). Selectable two ways, like realesrgan_fast: the
        # dedicated policy name fast_mamba_vsr_ssd, or extra.temporal_mixer
        # on the base entry. The variant suffix on the BASE stem keeps
        # checkpoints architecture-exact (fast_mamba_vsr_ssd_4x.npz).
        default_mixer = "ssd" if name.endswith("_ssd") else "ssm"
        mixer = (str(entry.extra.get("temporal_mixer", default_mixer))
                 if entry else default_mixer)
        params, _ = _load_or_init("fast_mamba_vsr", entry, m.init, dim=dim,
                                  num_layers=layers, scale=entry.scale,
                                  variant="" if mixer == "ssm" else mixer,
                                  temporal_mixer=mixer)
        return VSRHandler(
            name,
            calibrate_vsr(name,
                          lambda p, x: m.apply(p, x, scale=entry.scale)),
            params,
            scale=entry.scale, chunk=entry.chunk, overlap=entry.overlap,
            tile=entry.tile, tile_overlap=entry.tile_overlap, mesh=mesh,
        )

    if name == "vsrm":
        import os

        from ..models import vsrm as m

        dim = int(entry.extra.get("dim", 64)) if entry else 64
        blocks = int(entry.extra.get("num_blocks", 6)) if entry else 6
        # Backbone selection (reference PREFERRED_BACKBONE env at
        # config/model_config.py:108, which the reference never wires in;
        # here "mambairv2"/"attentive" swaps the spatial mixer for real).
        backbone = str(
            (entry.extra.get("backbone") if entry else None)
            or os.environ.get("VETPU_PREFERRED_BACKBONE", "eamamba")
        ).lower()
        mixer = "attentive" if backbone in ("mambairv2", "attentive") \
            else "ssd"
        params, _ = _load_or_init(name, entry, m.init,
                                  variant="" if mixer == "ssd" else mixer,
                                  dim=dim, num_blocks=blocks,
                                  scale=entry.scale, mixer=mixer)
        return VSRHandler(
            name,
            calibrate_vsr(name, lambda p, x: m.apply(p, x,
                                                     scale=entry.scale,
                                                     mixer=mixer)),
            params,
            scale=entry.scale, chunk=entry.window,
            overlap=max(entry.window - entry.stride, 0),
            tile=entry.tile, tile_overlap=entry.tile_overlap, mesh=mesh,
        )

    if name == "seedvr2":
        from ..models import seedvr2 as m

        base = int(entry.extra.get("base_channels", 32)) if entry else 32
        params, _ = _load_or_init(name, entry, m.init, base_channels=base)
        return VSRHandler(
            name, lambda p, x: m.apply(p, x), params,
            scale=1, chunk=entry.window,
            overlap=max(entry.window - entry.stride, 0),
            tile=entry.tile, tile_overlap=entry.tile_overlap,
            # Skip already-sharp windows (reference quality gating,
            # seedvr2_handler.py:506-550; threshold from policy extras).
            quality_threshold=float(entry.extra.get("quality_threshold",
                                                    0.85)),
            mesh=mesh,
        )

    if name == "ditvr":
        import jax.numpy as jnp

        from ..models import ditvr as m

        cfg = dict(entry.extra) if entry else {}
        heads = int(cfg.get("heads", 6))
        params, _ = _load_or_init(
            name, entry, m.init,
            dim=int(cfg.get("dim", 384)), depth=int(cfg.get("depth", 8)),
            heads=heads,
        )
        # Degradation conditioning arrives from the router per video
        # (reference ditvr estimates it per clip, ditvr_handler.py:718-788).
        return VSRHandler(
            name,
            calibrate_restore(
                name,
                lambda p, x, degradation_scores, degradation_type: m.apply(
                    p, x, degradation_type=degradation_type,
                    degradation_scores=degradation_scores, heads=heads,
                )),
            params,
            scale=1, chunk=entry.window,
            overlap=max(entry.window - entry.stride, 0),
            tile=entry.tile, tile_overlap=entry.tile_overlap,
            context={
                "degradation_scores": jnp.zeros((3,), jnp.float32),
                "degradation_type": jnp.zeros((), jnp.int32),
            },
            mesh=mesh,
        )

    if name == "rvrt":
        from ..models import rvrt as m

        dim = int(entry.extra.get("dim", 64)) if entry else 64
        params, _ = _load_or_init(name, entry, m.init, dim=dim,
                                  scale=entry.scale)
        return VSRHandler(
            name,
            calibrate_vsr(name,
                          lambda p, x: m.apply(p, x, scale=entry.scale)),
            params,
            scale=entry.scale, chunk=entry.window,
            overlap=max(entry.window - entry.stride, 0),
            tile=entry.tile, tile_overlap=entry.tile_overlap, mesh=mesh,
        )

    if name in ("realesrgan", "realesrgan_fast"):
        import os

        from ..models import realesrgan as m

        # Official released checkpoint at serve time (the reference's
        # RealESRGAN_x4plus.pth chain, realesrgan_handler.py:102-180):
        # VETPU_REALESRGAN_CKPT loads through the structurally-proven
        # conversion (models/official_arch.py + test_official_checkpoints)
        # into the published RRDBNet graph. Zero egress = no auto-download;
        # drop the file in and it serves.
        ckpt = os.environ.get("VETPU_REALESRGAN_CKPT")
        if name == "realesrgan" and ckpt:
            import jax as _jax

            from ..models.official_arch import (rrdb_official_apply,
                                                rrdb_official_init)
            from .weights import try_load_params

            template = rrdb_official_init(_jax.random.PRNGKey(0),
                                          **_OFFICIAL_RRDB_CFG)
            official = try_load_params(ckpt, template)
            if official is not None:
                def clip_apply_official(p, clip):
                    b, t = clip.shape[0], clip.shape[1]
                    frames = clip.reshape((b * t,) + clip.shape[2:])
                    out = rrdb_official_apply(p, frames)
                    return out.reshape((b, t) + out.shape[1:])

                return VSRHandler(
                    name, clip_apply_official, official, scale=4,
                    chunk=4, overlap=0, tile=entry.tile,
                    tile_overlap=entry.tile_overlap, mesh=mesh,
                )

        cfg = dict(entry.extra) if entry else {}
        params, _ = _load_or_init(
            name, entry, m.init,
            features=int(cfg.get("features", 64)),
            num_blocks=int(cfg.get("num_blocks", 6)), scale=entry.scale,
        )
        # Per-frame model: wrap as T-batched clip fn.
        def clip_apply(p, clip):
            b, t = clip.shape[0], clip.shape[1]
            frames = clip.reshape((b * t,) + clip.shape[2:])
            out = m.apply(p, frames, scale=entry.scale)
            return out.reshape((b, t) + out.shape[1:])

        # Calibrated strength applies to the bundled synthetic-trained
        # weights only; the official-checkpoint path above serves the
        # released Real-ESRGAN at full strength (its weights were not
        # part of the sweep).
        return VSRHandler(
            name, calibrate_vsr(name, clip_apply), params,
            scale=entry.scale,
            chunk=4, overlap=0, tile=entry.tile,
            tile_overlap=entry.tile_overlap, mesh=mesh,
        )

    raise KeyError(f"unknown model: {name}")
