"""Training checkpoints via orbax + npz export for inference.

The reference has no training checkpoints (inference-only, SURVEY.md §5);
its weight-resolution chain is the closest analog. Here: orbax saves the
full ``TrainState`` (params + optimizer + step) for resumable training, and
``export_params`` writes the flat npz that ``runtime.weights.try_load_params``
consumes.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax

from ..runtime.weights import save_params
from .step import TrainState

log = logging.getLogger(__name__)

__all__ = ["save_checkpoint", "restore_checkpoint", "export_params",
           "latest_step"]


def _manager(ckpt_dir: str | Path, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        Path(ckpt_dir).resolve(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_checkpoint(ckpt_dir: str | Path, state: TrainState) -> int:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = int(state.step)
    mgr.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(
                {"params": state.params, "opt_state": state.opt_state,
                 "step": state.step}
            )
        ),
    )
    mgr.wait_until_finished()
    return step


def latest_step(ckpt_dir: str | Path) -> int | None:
    import orbax.checkpoint as ocp

    try:
        return _manager(ckpt_dir).latest_step()
    except Exception:
        return None


def restore_checkpoint(ckpt_dir: str | Path,
                       template: TrainState) -> TrainState | None:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        return None
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(
                {"params": template.params, "opt_state": template.opt_state,
                 "step": template.step}
            )
        ),
    )["state"]
    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=restored["step"])


def export_params(path: str | Path, state: TrainState) -> str:
    """Write inference weights as flat npz (loadable by the registry's
    weight chain)."""
    params = jax.device_get(state.params)
    return save_params(path, params)
