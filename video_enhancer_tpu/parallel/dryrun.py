"""Multi-chip dry run: jit the full sharded train step on an N-device mesh.

Used by the driver's ``dryrun_multichip`` (and by CPU-mesh tests) to prove
the dp/time/space shardings compile and execute without real chips. The
flagship model here is the video form of the CNN upscaler (per-frame apply
vmapped over T); FastMambaVSR replaces it as the flagship once its kernels
land (tracked in SURVEY.md §7 step 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import upscaler
from ..train.step import make_optimizer, make_train_step
from .mesh import factor_devices, make_mesh

__all__ = ["run_dryrun"]


def run_dryrun(n_devices: int) -> None:
    devs = jax.devices()
    assert len(devs) >= n_devices, (
        f"need {n_devices} devices, jax sees {len(devs)} "
        f"(set XLA_FLAGS=--xla_force_host_platform_device_count={n_devices})"
    )
    data, time_, space = factor_devices(n_devices)
    mesh = make_mesh(data=data, time=time_, space=space)
    print(f"mesh: data={data} time={time_} space={space}")

    params, _ = upscaler.init(jax.random.PRNGKey(0), features=8, depth=1, scale=2)

    def apply_clip(p, clip):
        b, t = clip.shape[0], clip.shape[1]
        frames = clip.reshape((b * t,) + clip.shape[2:])
        out = upscaler.apply(p, frames, scale=2)
        return out.reshape((b, t) + out.shape[1:])

    optimizer = make_optimizer()
    init_state, train_step, shard_batch = make_train_step(
        apply_clip, optimizer, mesh
    )

    with mesh:
        state = init_state(params)
        # Tiny but shardable shapes: B, T, H divisible by their mesh axes.
        b, t, h, w = data * 2, time_ * 2, space * 16, 16
        lr = jnp.zeros((b, t, h, w, 3), jnp.float32)
        hr = jnp.zeros((b, t, h * 2, w * 2, 3), jnp.float32)
        batch = shard_batch({"lr": lr, "hr": hr})
        state, metrics = train_step(state, batch)
        loss = float(metrics["loss"])
        step = int(state.step)
    print(f"dryrun ok: devices={n_devices} step={step} loss={loss:.5f}")
    assert step == 1
