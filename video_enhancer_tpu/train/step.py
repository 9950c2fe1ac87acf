"""Sharded training step (pjit over a named mesh).

Params are replicated; clip batches are sharded (B over ``data``, T over
``time``, H over ``space``). XLA inserts the gradient all-reduce over the
mesh automatically from the sharding annotations — no hand-written
collectives in the train loop (scaling-book recipe: annotate, compile,
let XLA place psums on ICI).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .losses import vsr_loss

__all__ = ["TrainState", "make_train_step", "make_optimizer"]


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):  # pragma: no cover - registered below
        return (self.params, self.opt_state, self.step), None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(params=c[0], opt_state=c[1], step=c[2]),
)


def make_optimizer(lr: float = 2e-4, weight_decay: float = 1e-4):
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def make_train_step(
    apply_fn: Callable,
    optimizer,
    mesh: Mesh,
    batch_spec: P = P("data", "time", "space", None, None),
    loss_fn: Callable = vsr_loss,
):
    """Build ``(init_state, train_step)`` jitted over ``mesh``.

    ``apply_fn(params, lr_clip) -> sr_clip``. Batches: dict with ``lr`` and
    ``hr`` clips of shape (B, T, H, W, C).
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, batch_spec)

    def init_state(params) -> TrainState:
        params = jax.device_put(params, repl)
        return TrainState(
            params=params,
            opt_state=jax.device_put(optimizer.init(params), repl),
            step=jnp.zeros((), jnp.int32),
        )

    import inspect

    # A loss that declares an ``lr`` kwarg also receives the input clip
    # (e.g. the correction-magnitude penalty in train/cli.py, which needs
    # the non-ML fallback derived from the input).
    _loss_wants_lr = "lr" in inspect.signature(loss_fn).parameters

    def _loss(params, lr, hr):
        pred = apply_fn(params, lr)
        if _loss_wants_lr:
            return loss_fn(pred, hr, lr=lr)
        return loss_fn(pred, hr)

    @jax.jit
    def train_step(state: TrainState, batch: dict):
        loss, grads = jax.value_and_grad(_loss)(
            state.params, batch["lr"], batch["hr"]
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, {"loss": loss}

    def shard_batch(batch: dict) -> dict:
        return {k: jax.device_put(v, batch_sh) for k, v in batch.items()}

    return init_state, train_step, shard_batch
