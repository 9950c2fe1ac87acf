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


def test_sharded_clip_inference_upscaler_exact(cpu_mesh_devices):
    """Per-frame model: time-sharded inference must be bit-identical."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.models import upscaler
    from video_enhancer_tpu.parallel.inference import make_sharded_clip_fn
    from video_enhancer_tpu.parallel.mesh import make_mesh

    params, _ = upscaler.init(jax.random.PRNGKey(0), features=8, depth=1,
                              s2d=2, scale=2)

    def apply_clip(p, clip):
        b, t = clip.shape[0], clip.shape[1]
        frames = clip.reshape((b * t,) + clip.shape[2:])
        out = upscaler.apply(p, frames, scale=2, s2d=2)
        return out.reshape((b, t) + out.shape[1:])

    mesh = make_mesh(data=2, time=4)
    fn = make_sharded_clip_fn(apply_clip, mesh, halo=1)
    clip = jnp.asarray(
        np.random.default_rng(0).random((2, 8, 16, 16, 3), np.float32)
    )
    with mesh:
        out_sharded = np.asarray(fn(params, clip))
    out_ref = np.asarray(apply_clip(params, clip))
    assert out_sharded.shape == out_ref.shape
    np.testing.assert_allclose(out_sharded, out_ref, atol=1e-5)


def test_sharded_clip_inference_fmv_close(cpu_mesh_devices):
    """Temporal model: sharded+halo output close to full-clip output
    (same approximation class as the reference's chunk-overlap)."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.models import fast_mamba_vsr as fmv
    from video_enhancer_tpu.parallel.inference import make_sharded_clip_fn
    from video_enhancer_tpu.parallel.mesh import make_mesh

    params, _ = fmv.init(jax.random.PRNGKey(0), dim=8, num_layers=1, scale=2)
    apply_clip = lambda p, c: fmv.apply(p, c, scale=2, scan_impl="ref")
    mesh = make_mesh(time=2)
    fn = make_sharded_clip_fn(apply_clip, mesh, halo=2)
    clip = jnp.asarray(
        np.random.default_rng(1).random((1, 8, 16, 16, 3), np.float32)
    )
    with mesh:
        out_sharded = np.asarray(fn(params, clip))
    out_ref = np.asarray(apply_clip(params, clip))
    assert out_sharded.shape == out_ref.shape
    err = np.abs(out_sharded - out_ref).mean()
    assert err < 0.01, err


def test_sharded_clip_fn_validates_shapes(cpu_mesh_devices):
    import jax
    import jax.numpy as jnp
    import pytest

    from video_enhancer_tpu.parallel.inference import make_sharded_clip_fn
    from video_enhancer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(time=4)
    fn = make_sharded_clip_fn(lambda p, c: c, mesh, halo=2)
    with pytest.raises(ValueError, match="not divisible"):
        fn({}, jnp.zeros((1, 7, 4, 4, 3)))
    with pytest.raises(ValueError, match="< halo"):
        fn({}, jnp.zeros((1, 4, 4, 4, 3)))


def test_spatially_sharded_upscaler_exact(cpu_mesh_devices):
    """H-sharded inference with halo: per-frame conv model stays exact
    when the halo covers its receptive field."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.models import upscaler
    from video_enhancer_tpu.parallel.mesh import make_mesh
    from video_enhancer_tpu.parallel.spatial import (
        make_spatially_sharded_clip_fn,
    )

    params, _ = upscaler.init(jax.random.PRNGKey(0), features=8, depth=1,
                              s2d=2, scale=2)

    def apply_clip(p, clip):
        b, t = clip.shape[0], clip.shape[1]
        frames = clip.reshape((b * t,) + clip.shape[2:])
        out = upscaler.apply(p, frames, scale=2, s2d=2)
        return out.reshape((b, t) + out.shape[1:])

    mesh = make_mesh(data=2, space=4)
    fn = make_spatially_sharded_clip_fn(apply_clip, mesh, halo=8, scale=2)
    clip = jnp.asarray(
        np.random.default_rng(0).random((2, 2, 64, 16, 3), np.float32)
    )
    with mesh:
        out_sharded = np.asarray(fn(params, clip))
    out_ref = np.asarray(apply_clip(params, clip))
    assert out_sharded.shape == out_ref.shape
    # Interior rows exact; the bicubic base's 4-tap kernel stays inside
    # the 8-row halo, so everything matches.
    np.testing.assert_allclose(out_sharded, out_ref, atol=2e-5)


def test_spatial_sharding_validates(cpu_mesh_devices):
    import jax.numpy as jnp
    import pytest

    from video_enhancer_tpu.parallel.mesh import make_mesh
    from video_enhancer_tpu.parallel.spatial import (
        make_spatially_sharded_clip_fn,
    )

    mesh = make_mesh(space=4)
    fn = make_spatially_sharded_clip_fn(lambda p, c: c, mesh, halo=4)
    with pytest.raises(ValueError, match="not divisible"):
        fn({}, jnp.zeros((1, 2, 30, 8, 3)))


def test_handler_uses_policy_mesh(cpu_mesh_devices, tmp_path, monkeypatch):
    """A policy with mesh time=2,space=2 routes handler clips through the
    sharded path, matching the single-device result."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.config import load_policy
    from video_enhancer_tpu.runtime.registry import _build, clear_cache

    policy_yaml = tmp_path / "policy.yaml"
    import pathlib

    base = pathlib.Path(
        "video_enhancer_tpu/config/policy_v1.yaml").read_text()
    policy_yaml.write_text(
        base.replace("mesh:\n  data: 1\n  time: 1\n  space: 1",
                     "mesh:\n  data: 1\n  time: 2\n  space: 2"))
    policy = load_policy(policy_yaml)
    assert policy.mesh.num_devices == 4

    clear_cache()
    h = _build("fast_mamba_vsr", policy, seed=0)
    assert h.mesh is not None
    clip = jnp.asarray(
        np.random.default_rng(0).random((4, 32, 16, 3), np.float32)
    )
    out_sharded = np.asarray(h.process_clip(clip))
    # single-device comparison
    h._sharded = None
    out_local = np.asarray(h.process_clip(clip))
    assert out_sharded.shape == out_local.shape
    # With TRAINED bundled weights the temporal halo is an approximation
    # (same class as the reference's chunk-overlap); bound the deviation.
    err = np.abs(out_sharded - out_local).mean()
    assert err < 0.05, err
    clear_cache()


def test_exact_sharded_fmv_matches_single_device(cpu_mesh_devices):
    """The exact T-sharded FastMambaVSR must match unsharded output to
    float tolerance (NOT the halo approximation)."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.models import fast_mamba_vsr as fmv
    from video_enhancer_tpu.parallel.inference import make_exact_sharded_fmv
    from video_enhancer_tpu.parallel.mesh import make_mesh

    params, _ = fmv.init(jax.random.PRNGKey(3), dim=8, num_layers=2,
                         scale=2)
    # Give the zero-init heads live weights so the comparison is not
    # trivially bicubic.
    params["head"]["w"] = jax.random.normal(
        jax.random.PRNGKey(4), params["head"]["w"].shape) * 0.05
    params["temporal"]["w"] = jax.random.normal(
        jax.random.PRNGKey(5), params["temporal"]["w"].shape) * 0.05

    clip = jnp.asarray(
        np.random.default_rng(2).random((1, 8, 16, 16, 3), np.float32)
    )
    ref = np.asarray(fmv.apply(params, clip, scale=2, scan_impl="ref"))

    mesh = make_mesh(time=2)  # T_loc=4 >= conv halo 3
    fn = make_exact_sharded_fmv(mesh, scale=2)
    with mesh:
        out = np.asarray(fn(params, clip))
    assert out.shape == ref.shape
    err = np.max(np.abs(out - ref))
    assert err < 1e-4, err


def _exact_check(make_fn, apply_single, params, clip, tol=1e-5):
    import jax
    import numpy as np

    from video_enhancer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(time=4)
    fn = make_fn(mesh)
    with mesh:
        sharded = np.asarray(fn(params, clip))
    single = np.asarray(jax.jit(apply_single)(params, clip))
    err = float(np.abs(sharded - single).max())
    assert err < tol, f"sharded vs single-device max err {err}"


def test_exact_sharded_vsrm(cpu_mesh_devices):
    import jax

    from video_enhancer_tpu.models import vsrm
    from video_enhancer_tpu.parallel.inference import make_exact_sharded_vsrm

    params, _ = vsrm.init(jax.random.PRNGKey(0), dim=16, num_blocks=2,
                          scale=2)
    clip = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 8, 3))
    _exact_check(
        lambda mesh: make_exact_sharded_vsrm(mesh, scale=2),
        lambda p, c: vsrm.apply(p, c, scale=2, scan_impl="ref"),
        params, clip)


def test_exact_sharded_seedvr2(cpu_mesh_devices):
    import jax

    from video_enhancer_tpu.models import seedvr2
    from video_enhancer_tpu.parallel.inference import (
        make_exact_sharded_seedvr2,
    )

    params, _ = seedvr2.init(jax.random.PRNGKey(0), base_channels=8)
    clip = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 16, 16, 3))
    _exact_check(
        make_exact_sharded_seedvr2,
        lambda p, c: seedvr2.apply(p, c),
        params, clip)


def test_exact_sharded_ditvr(cpu_mesh_devices):
    import jax

    from video_enhancer_tpu.models import ditvr
    from video_enhancer_tpu.parallel.inference import make_exact_sharded_ditvr

    params, _ = ditvr.init(jax.random.PRNGKey(0), dim=32, depth=2, heads=2)
    clip = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 8, 3))
    _exact_check(
        lambda mesh: make_exact_sharded_ditvr(mesh, heads=2),
        lambda p, c: ditvr.apply(p, c, heads=2),
        params, clip)


def test_ring_attention_exact(cpu_mesh_devices):
    """Ring attention over a 4-shard token axis == single-device softmax
    attention (SURVEY §5 long-context: the scalable form of sequence-
    parallel attention; gather-K/V covers short sequences)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_enhancer_tpu.ops.attention import attention_ref
    from video_enhancer_tpu.ops.ring import ring_attention
    from video_enhancer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(time=4)
    B, H, L, D = 2, 3, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, L, D))
    k = jax.random.normal(ks[1], (B, H, L, D))
    v = jax.random.normal(ks[2], (B, H, L, D))

    spec = P(None, None, "time", None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name="time"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    with mesh:
        args = [jax.device_put(a, NamedSharding(mesh, spec))
                for a in (q, k, v)]
        out = np.asarray(jax.jit(fn)(*args))
    ref = np.asarray(attention_ref(q, k, v))
    assert float(np.abs(out - ref).max()) < 1e-5


def test_sharded_attention_ring_path_exact(cpu_mesh_devices):
    import functools

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_enhancer_tpu.ops.attention import attention_ref
    from video_enhancer_tpu.ops.ring import sharded_attention
    from video_enhancer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(time=4)
    B, L, C, heads = 1, 128, 32, 4
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, L, C)) for kk in ks)

    spec = P(None, "time", None)
    for min_ring in (1, 10**9):  # force ring path, then gather path
        fn = shard_map(
            functools.partial(sharded_attention, heads=heads,
                              axis_name="time", min_ring_tokens=min_ring),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )
        with mesh:
            args = [jax.device_put(a, NamedSharding(mesh, spec))
                    for a in (q, k, v)]
            out = np.asarray(jax.jit(fn)(*args))

        def mh(z):
            return z.reshape(B, L, heads, C // heads).transpose(0, 2, 1, 3)

        ref = attention_ref(mh(q), mh(k), mh(v))
        ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(B, L, C))
        assert float(np.abs(out - ref).max()) < 1e-5, min_ring


def test_ssd_parallel_scan_exact(cpu_mesh_devices):
    """Distributed SSD scan (scalar-per-head decay) vs the sequential
    ground truth, both directions."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_enhancer_tpu.ops.ssd import ssd_ref
    from video_enhancer_tpu.parallel.mesh import make_mesh
    from video_enhancer_tpu.parallel.temporal import ssd_parallel_scan

    B, L, H, Pd, N = 2, 32, 2, 4, 3
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (B, L, H, Pd))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, L, H)) * 0.5)
    A = -jnp.exp(jax.random.normal(ks[2], (H,)) * 0.3)
    Bm = jax.random.normal(ks[3], (B, L, N))
    Cm = jax.random.normal(ks[4], (B, L, N))

    mesh = make_mesh(time=4)
    seq = P(None, "time")
    rep = P()
    for reverse in (False, True):
        fn = shard_map(
            functools.partial(ssd_parallel_scan, axis_name="time",
                              chunk=8, reverse=reverse),
            mesh=mesh,
            in_specs=(seq, seq, rep, seq, seq),
            out_specs=seq,
        )
        with mesh:
            args = [jax.device_put(a, NamedSharding(mesh, s))
                    for a, s in ((x, seq), (dt, seq), (A, rep),
                                 (Bm, seq), (Cm, seq))]
            out = np.asarray(jax.jit(fn)(*args))

        Bh = jnp.broadcast_to(Bm[:, :, None, :], (B, L, H, N))
        Ch = jnp.broadcast_to(Cm[:, :, None, :], (B, L, H, N))
        if reverse:
            flip = lambda t: jnp.flip(t, axis=1)
            ref, _ = ssd_ref(flip(x), flip(dt), A, flip(Bh), flip(Ch))
            ref = flip(ref)
        else:
            ref, _ = ssd_ref(x, dt, A, Bh, Ch)
        err = float(np.abs(out - np.asarray(ref)).max())
        assert err < 1e-4, (reverse, err)


def test_exact_sharded_fmv_ssd_mixer(cpu_mesh_devices):
    """FMV with the SSD temporal mixer, T-sharded, matches unsharded
    (round-4: the ssd preset's exact T-sharding, VERDICT item 2)."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.models import fast_mamba_vsr as fmv
    from video_enhancer_tpu.parallel.inference import make_exact_sharded_fmv
    from video_enhancer_tpu.parallel.mesh import make_mesh

    params, meta = fmv.init(jax.random.PRNGKey(3), dim=8, num_layers=2,
                            scale=2, temporal_mixer="ssd")
    assert meta["temporal_mixer"] == "ssd"
    params["head"]["w"] = jax.random.normal(
        jax.random.PRNGKey(4), params["head"]["w"].shape) * 0.05
    params["temporal"]["w"] = jax.random.normal(
        jax.random.PRNGKey(5), params["temporal"]["w"].shape) * 0.05

    clip = jnp.asarray(
        np.random.default_rng(2).random((1, 8, 16, 16, 3), np.float32)
    )
    ref = np.asarray(fmv.apply(params, clip, scale=2))

    mesh = make_mesh(time=2)  # T_loc=4 >= ssd conv halo 2
    fn = make_exact_sharded_fmv(mesh, scale=2)
    with mesh:
        out = np.asarray(fn(params, clip))
    assert out.shape == ref.shape
    err = np.max(np.abs(out - ref))
    assert err < 1e-4, err
