"""Minimal functional layer library: param pytrees + pure apply functions.

No Module framework: every layer is an ``*_init(key, ...) -> dict`` and a pure
``apply(params, x)`` pair, composed into nested dicts whose key paths mirror
torch ``state_dict`` naming closely enough for mechanical checkpoint
conversion. Keeps the whole model a transparent pytree for pjit sharding.
"""

from .core import (  # noqa: F401
    conv2d_init,
    conv2d_apply,
    conv3d_init,
    conv3d_apply,
    dense_init,
    dense_apply,
    group_norm_apply,
    group_norm_init,
    layer_norm_apply,
    layer_norm_init,
    mlp_apply,
    mlp_init,
    rms_norm_apply,
    rms_norm_init,
    sinusoidal_embedding,
)
