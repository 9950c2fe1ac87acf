"""Temporal context parallelism on the 8-device CPU mesh."""

import numpy as np
import pytest


def test_halo_exchange_matches_padding(cpu_mesh_devices):
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_enhancer_tpu.parallel.mesh import make_mesh
    from video_enhancer_tpu.parallel.temporal import halo_exchange_time

    mesh = make_mesh(time=4)
    halo = 2
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 16, 4, 4, 3), np.float32)
    )

    fn = shard_map(
        lambda xs: halo_exchange_time(xs, halo),
        mesh=mesh,
        in_specs=P(None, "time"),
        out_specs=P(None, "time"),
    )
    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "time")))
        out = np.asarray(jax.jit(fn)(xs))

    # Each shard of 4 frames becomes 8 (2+4+2); verify shard 1's halo.
    t_loc = 4
    shard1 = out[:, 1 * (t_loc + 2 * halo): 2 * (t_loc + 2 * halo)]
    ref = np.asarray(x)
    np.testing.assert_allclose(shard1[:, :halo], ref[:, t_loc - halo: t_loc])
    np.testing.assert_allclose(shard1[:, halo: halo + t_loc],
                               ref[:, t_loc: 2 * t_loc])
    np.testing.assert_allclose(shard1[:, -halo:],
                               ref[:, 2 * t_loc: 2 * t_loc + halo])
    # Edge shard 0 replicates its first frame.
    shard0 = out[:, : t_loc + 2 * halo]
    np.testing.assert_allclose(shard0[:, 0], ref[:, 0])
    np.testing.assert_allclose(shard0[:, 1], ref[:, 0])


def test_temporal_parallel_scan_exact(cpu_mesh_devices):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_enhancer_tpu.ops.scan import selective_scan_ref
    from video_enhancer_tpu.parallel.mesh import make_mesh
    from video_enhancer_tpu.parallel.temporal import make_temporal_scan

    B, L, Dd, N = 2, 64, 8, 4
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 6)
    x = jax.random.normal(ks[0], (B, L, Dd))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, L, Dd)) * 0.5)
    A = -jax.nn.softplus(jax.random.normal(ks[2], (Dd, N)))
    Bm = jax.random.normal(ks[3], (B, L, N)) * 0.5
    C = jax.random.normal(ks[4], (B, L, N)) * 0.5
    D = jax.random.normal(ks[5], (Dd,))

    y_ref, _ = selective_scan_ref(x, dt, A, Bm, C, D)

    mesh = make_mesh(time=8)
    scan = make_temporal_scan(mesh, impl="ref")
    with mesh:
        sh = NamedSharding(mesh, P(None, "time", None))
        args = [jax.device_put(v, sh) for v in (x, dt, Bm, C)]
        y = scan(args[0], args[1], A, args[2], args[3], D)
    err = float(jnp.max(jnp.abs(np.asarray(y) - np.asarray(y_ref))))
    assert err < 1e-4, err
