"""Checkpoint loading: orbax dir / .npz flat dict / torch .pt conversion.

The "checkpoint system" of the reference is its weight-resolution chain with
lenient partial loading (reference vsrm_handler.py:412-468 strict=False with
key-matching report). Equivalent here: any keys present in the file that
match the target pytree's path+shape are taken; everything else keeps its
initialization, with a report logged.
"""

from __future__ import annotations

import logging
import pathlib

import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

__all__ = ["try_load_params", "save_params", "flatten_params",
           "unflatten_into", "convert_torch_state_dict"]


def flatten_params(params, prefix="") -> dict[str, np.ndarray]:
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(flatten_params(v, f"{prefix}{k}."))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(flatten_params(v, f"{prefix}{i}."))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def unflatten_into(template, flat: dict[str, np.ndarray]):
    """Fill template pytree with matching entries from flat (lenient)."""
    matched, skipped = [], []

    def fill(node, prefix=""):
        if isinstance(node, dict):
            return {k: fill(v, f"{prefix}{k}.") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [fill(v, f"{prefix}{i}.") for i, v in enumerate(node)]
            return type(node)(vals) if isinstance(node, tuple) else vals
        key = prefix[:-1]
        if key in flat and flat[key].shape == tuple(node.shape):
            matched.append(key)
            return jnp.asarray(flat[key]).astype(node.dtype)
        skipped.append(key)
        return node

    out = fill(template)
    log.info("checkpoint: matched %d keys, kept init for %d",
             len(matched), len(skipped))
    total = len(matched) + len(skipped)
    if flat and total and len(matched) < total / 2:
        log.warning(
            "checkpoint: only %d/%d target leaves matched — checkpoint is "
            "likely for a different architecture/size (unmatched e.g. %s)",
            len(matched), total, skipped[:5])
    return out, matched, skipped


def save_params(path, params) -> str:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flatten_params(params))
    return str(path)


def convert_torch_state_dict(state_dict) -> dict[str, np.ndarray]:
    """Map a torch state_dict to our flat naming/layout conventions.

    Linear ``weight (out,in)`` -> ``w (in,out)``; ConvNd ``weight
    (out,in,*k)`` -> ``w (*k,in,out)`` (Conv1d included); ``bias`` is
    emitted under BOTH ``b`` (dense/conv) and ``bias`` (norm) since the
    lenient loader matches by key+shape; 1-D ``weight`` likewise under both
    ``scale`` and ``w``.
    """
    flat = {}
    for name, t in state_dict.items():
        arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        base, _, leaf = name.rpartition(".")
        if leaf == "weight":
            if arr.ndim == 2:
                flat[f"{base}.w"] = arr.T
            elif arr.ndim == 3:  # Conv1d (out,in,k) — e.g. Mamba depthwise
                flat[f"{base}.w"] = arr.transpose(2, 1, 0)
            elif arr.ndim == 4:
                flat[f"{base}.w"] = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 5:
                flat[f"{base}.w"] = arr.transpose(2, 3, 4, 1, 0)
            elif arr.ndim == 1:
                flat[f"{base}.scale"] = arr
                flat[f"{base}.w"] = arr
            else:
                flat[f"{base}.w"] = arr
        elif leaf == "bias":
            flat[f"{base}.b"] = arr
            flat[f"{base}.bias"] = arr
        else:
            flat[name] = arr
    return flat


def try_load_params(path, template):
    """Load weights from path if possible; None on failure (callers keep
    their random init, mirroring the reference's graceful chain)."""
    p = pathlib.Path(path)
    try:
        if p.is_dir():
            npzs = sorted(p.glob("*.npz"))
            pts = sorted(list(p.glob("*.pt")) + list(p.glob("*.pth")))
            p = npzs[0] if npzs else (pts[0] if pts else p)
        if str(p).endswith(".npz") and p.exists():
            flat = dict(np.load(p, allow_pickle=False))
            out, matched, _ = unflatten_into(template, flat)
            return out if matched else None
        if str(p).endswith((".pt", ".pth")) and p.exists():
            import torch

            sd = torch.load(str(p), map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            flat = convert_torch_state_dict(sd)
            out, matched, _ = unflatten_into(template, flat)
            return out if matched else None
    except Exception as e:
        log.warning("weight load failed for %s: %s", path, e)
    return None
