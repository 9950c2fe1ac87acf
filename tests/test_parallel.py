"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np


def test_factor_devices():
    from video_enhancer_tpu.parallel.mesh import factor_devices

    assert factor_devices(1) == (1, 1, 1)
    assert factor_devices(2) == (2, 1, 1)
    assert factor_devices(4) == (2, 2, 1)
    assert factor_devices(8) == (2, 2, 2)


def test_mesh_and_clip_sharding(cpu_mesh_devices):
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.parallel import clip_sharding, make_mesh

    mesh = make_mesh(data=2, time=2, space=2)
    x = jnp.zeros((4, 4, 32, 16, 3))
    xs = jax.device_put(x, clip_sharding(mesh))
    assert len(xs.sharding.device_set) == 8


def test_dryrun_full_train_step(cpu_mesh_devices):
    from video_enhancer_tpu.parallel.dryrun import run_dryrun

    run_dryrun(8)


def test_sharded_train_step_matches_single_device():
    """DP+time+space sharded step must produce the same loss as 1 device."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.models import upscaler
    from video_enhancer_tpu.parallel.mesh import make_mesh
    from video_enhancer_tpu.train.step import make_optimizer, make_train_step

    params, _ = upscaler.init(jax.random.PRNGKey(0), features=8, depth=1)

    def apply_clip(p, clip):
        b, t = clip.shape[0], clip.shape[1]
        frames = clip.reshape((b * t,) + clip.shape[2:])
        out = upscaler.apply(p, frames, scale=2)
        return out.reshape((b, t) + out.shape[1:])

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((8, 4, 32, 16, 3), np.float32))
    hr = jnp.asarray(rng.random((8, 4, 64, 32, 3), np.float32))

    losses = {}
    for name, mesh in {
        "single": make_mesh(data=1),
        "dp8": make_mesh(data=8),
        "dts": make_mesh(data=2, time=2, space=2),
    }.items():
        optimizer = make_optimizer()
        init_state, train_step, shard_batch = make_train_step(
            apply_clip, optimizer, mesh
        )
        with mesh:
            state = init_state(params)
            batch = shard_batch({"lr": lr, "hr": hr})
            state, m = train_step(state, batch)
            losses[name] = float(m["loss"])
    assert abs(losses["single"] - losses["dp8"]) < 1e-5
    assert abs(losses["single"] - losses["dts"]) < 1e-5


def test_fsdp_sharded_ditvr_fsdp(cpu_mesh_devices):
    """FSDP-sharded DiTVR initializes with parameters sharded over the
    mesh — no per-device replica — and runs a forward window. The "base"
    preset keeps host RAM bounded on the CPU test (the honest-size 3b =
    3.06B params = 12 GB f32 no longer fits this host); the 3b preset is
    covered compile-only by parallel/dryrun.py's FSDP lowering check."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.parallel.mesh import make_mesh
    from video_enhancer_tpu.parallel.model_parallel import make_sharded_ditvr

    mesh = make_mesh(data=8)
    params, fn = make_sharded_ditvr(mesh, preset="base", min_bytes=1 << 18)

    # Big weights are actually sharded: a DiT block's qkv is (768, 2304).
    qkv = params["blocks"][0]["qkv"]["w"]
    assert qkv.shape == (768, 3 * 768)
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert all(np.prod(s) < qkv.size for s in shard_shapes), (
        "qkv replicated instead of sharded")

    clip = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3),
                              jnp.float32)
    with mesh:
        out = fn(params, clip)
    assert out.shape == clip.shape
    assert bool(jnp.isfinite(out).all())
