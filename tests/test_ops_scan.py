"""Selective-scan implementations must agree with each other."""

import numpy as np
import pytest


def _inputs(B=2, L=24, D=8, N=4, seed=0):
    import jax
    import jax.numpy as jnp

    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 6)
    x = jax.random.normal(ks[0], (B, L, D))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, L, D)) * 0.5)
    A = -jax.nn.softplus(jax.random.normal(ks[2], (D, N)))  # stable decay
    Bmat = jax.random.normal(ks[3], (B, L, N)) * 0.5
    C = jax.random.normal(ks[4], (B, L, N)) * 0.5
    D_skip = jax.random.normal(ks[5], (D,))
    return x, dt, A, Bmat, C, D_skip


def test_assoc_matches_ref():
    from video_enhancer_tpu.ops import selective_scan_assoc, selective_scan_ref

    args = _inputs()
    y_ref, h_ref = selective_scan_ref(*args)
    y_as, h_as = selective_scan_assoc(*args)
    assert np.max(np.abs(np.asarray(y_ref) - np.asarray(y_as))) < 1e-4
    assert np.max(np.abs(np.asarray(h_ref) - np.asarray(h_as))) < 1e-4


def test_pallas_matches_ref_interpret():
    from video_enhancer_tpu.ops import selective_scan_pallas, selective_scan_ref

    args = _inputs(B=2, L=32, D=8, N=4, seed=1)
    y_ref, h_ref = selective_scan_ref(*args)
    y_pl, h_pl = selective_scan_pallas(*args, interpret=True)
    assert np.max(np.abs(np.asarray(y_ref) - np.asarray(y_pl))) < 1e-4
    assert np.max(np.abs(np.asarray(h_ref) - np.asarray(h_pl))) < 1e-4


def test_pallas_non_pow2_length():
    from video_enhancer_tpu.ops import selective_scan_pallas, selective_scan_ref

    args = _inputs(B=1, L=37, D=8, N=4, seed=2)
    y_ref, _ = selective_scan_ref(*args)
    y_pl, _ = selective_scan_pallas(*args, interpret=True)
    assert np.max(np.abs(np.asarray(y_ref) - np.asarray(y_pl))) < 1e-4


def test_initial_state_carry():
    import jax.numpy as jnp

    from video_enhancer_tpu.ops import selective_scan_ref

    x, dt, A, Bmat, C, D = _inputs(B=1, L=16, seed=3)
    # Full scan == two half scans with state carried.
    y_full, h_full = selective_scan_ref(x, dt, A, Bmat, C, D)
    y1, h1 = selective_scan_ref(x[:, :8], dt[:, :8], A, Bmat[:, :8], C[:, :8], D)
    y2, h2 = selective_scan_ref(
        x[:, 8:], dt[:, 8:], A, Bmat[:, 8:], C[:, 8:], D, h0=h1
    )
    y_cat = jnp.concatenate([y1, y2], axis=1)
    assert np.max(np.abs(np.asarray(y_full) - np.asarray(y_cat))) < 1e-4
    assert np.max(np.abs(np.asarray(h_full) - np.asarray(h2))) < 1e-4


def test_chunked_equals_full():
    from video_enhancer_tpu.ops import chunked_selective_scan, selective_scan_ref

    args = _inputs(B=2, L=40, seed=4)
    y_full, h_full = selective_scan_ref(*args)
    y_ch, h_ch = chunked_selective_scan(*args, chunk=16, impl="ref")
    assert np.max(np.abs(np.asarray(y_full) - np.asarray(y_ch))) < 1e-4
    assert np.max(np.abs(np.asarray(h_full) - np.asarray(h_ch))) < 1e-4


def test_pallas_short_matches_ref():
    from video_enhancer_tpu.ops.scan import (
        selective_scan_pallas_short, selective_scan_ref,
    )

    # huge-B short-L shape (the video temporal scan), non-multiple of block
    args = _inputs(B=300, L=8, D=16, N=4, seed=5)
    y_ref, h_ref = selective_scan_ref(*args)
    y_pl, h_pl = selective_scan_pallas_short(*args, interpret=True)
    assert np.max(np.abs(np.asarray(y_ref) - np.asarray(y_pl))) < 1e-4
    assert np.max(np.abs(np.asarray(h_ref) - np.asarray(h_pl))) < 1e-4


def test_pallas_short_with_initial_state():
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.ops.scan import (
        selective_scan_pallas_short, selective_scan_ref,
    )

    args = _inputs(B=64, L=6, D=8, N=4, seed=6)
    h0 = jax.random.normal(jax.random.PRNGKey(9), (64, 8, 4))
    y_ref, h_ref = selective_scan_ref(*args, h0=h0)
    y_pl, h_pl = selective_scan_pallas_short(*args, h0=h0, interpret=True)
    assert np.max(np.abs(np.asarray(y_ref) - np.asarray(y_pl))) < 1e-4
    assert np.max(np.abs(np.asarray(h_ref) - np.asarray(h_pl))) < 1e-4


def test_pallas_short_nostate_matches_ref():
    from video_enhancer_tpu.ops.scan import (
        selective_scan_pallas_short, selective_scan_ref,
    )

    args = _inputs(B=300, L=8, D=16, N=4, seed=7)
    y_ref, _ = selective_scan_ref(*args)
    y_pl, h = selective_scan_pallas_short(*args, interpret=True,
                                          need_state=False)
    assert h is None
    assert np.max(np.abs(np.asarray(y_ref) - np.asarray(y_pl))) < 1e-4


def test_bidir_kernel_matches_two_scans():
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.ops.scan import (
        selective_scan_bidir, selective_scan_ref,
    )

    f = _inputs(B=64, L=8, D=16, N=4, seed=10)
    b = _inputs(B=64, L=8, D=16, N=4, seed=11)
    yf_ref, _ = selective_scan_ref(*f)
    flip = lambda a: jnp.flip(a, axis=1)
    xb, dtb, Ab, Bb, Cb, Db = b
    yb_ref, _ = selective_scan_ref(flip(xb), flip(dtb), Ab, flip(Bb),
                                   flip(Cb), Db)
    yb_ref = flip(yb_ref)

    yf, yb = selective_scan_bidir(*f, *b, interpret=True)
    assert np.max(np.abs(np.asarray(yf) - np.asarray(yf_ref))) < 1e-4
    assert np.max(np.abs(np.asarray(yb) - np.asarray(yb_ref))) < 1e-4


def test_ssm_reverse_anticausal_equivalence():
    """The anti-causal-conv formulation must equal the old flip-based one."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.nn.core import dense_apply
    from video_enhancer_tpu.nn.ssm import ssm_apply, ssm_init
    from video_enhancer_tpu.ops.conv import depthwise_conv1d
    from video_enhancer_tpu.ops.scan import selective_scan

    p = ssm_init(jax.random.PRNGKey(0), dim=8, state_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 8))

    # old formulation: flip input, full causal pipeline, flip output
    def old_reverse(p, x):
        xr = jnp.flip(x, axis=1)
        state_dim = p["A_log"].shape[1]
        dt_rank = p["x_proj"]["w"].shape[1] - 2 * state_dim
        xz = dense_apply(p["in_proj"], xr)
        u, gate = jnp.split(xz, 2, axis=-1)
        k = p["conv_w"].shape[0]
        u = depthwise_conv1d(u, p["conv_w"].astype(u.dtype), p["conv_b"],
                             padding=((k - 1, 0),))
        u = jax.nn.silu(u)
        proj = dense_apply(p["x_proj"], u)
        Bm = proj[..., dt_rank:dt_rank + state_dim]
        Cm = proj[..., dt_rank + state_dim:]
        dt = jax.nn.softplus(
            dense_apply(p["dt_proj"], proj[..., :dt_rank]) + p["dt_bias"])
        A = -jnp.exp(p["A_log"])
        y, _ = selective_scan(u, dt, A, Bm, Cm, p["D"], impl="ref")
        y = y * jax.nn.silu(gate)
        return jnp.flip(dense_apply(p["out_proj"], y), axis=1)

    ref = np.asarray(old_reverse(p, x))
    new = np.asarray(ssm_apply(p, x, reverse=True, impl="ref"))
    assert np.max(np.abs(ref - new)) < 1e-4


def test_pallas_short_gradients_match_ref():
    """Grad through the kernel path (custom VJP via ref) == grad of ref."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.ops.scan import (
        _short_nostate_diffable, selective_scan_ref,
    )

    args = _inputs(B=32, L=6, D=8, N=4, seed=12)

    def loss_kernel(x, dt, A, Bm, C, D):
        return jnp.sum(_short_nostate_diffable(x, dt, A, Bm, C, D) ** 2)

    def loss_ref(x, dt, A, Bm, C, D):
        return jnp.sum(selective_scan_ref(x, dt, A, Bm, C, D)[0] ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(*args)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for a, b in zip(g1, g2):
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 1e-3


def test_fused_bissm_kernel_matches_composed_ref():
    """The one-kernel bissm interior (conv+silu+proj+bidir scan+gate)
    matches the composed five-op reference, interpret mode."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.ops.scan import (_fused_bissm_ref,
                                             fused_bidir_ssm)

    B, L, D, N, K, dt_rank = 12, 7, 16, 4, 5, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 13)
    u = jax.random.normal(ks[0], (B, L, D), jnp.float32)
    gate = jax.random.normal(ks[1], (B, L, D), jnp.float32)
    cw = jax.random.normal(ks[2], (K, 1, D)) * 0.3
    cb = jax.random.normal(ks[3], (D,)) * 0.1
    wx = jax.random.normal(ks[4], (D, dt_rank + 2 * N)) * 0.2
    wdt = jax.random.normal(ks[5], (dt_rank, D)) * 0.2
    bdt = jax.random.normal(ks[6], (D,)) * 0.1
    dtbf = jax.random.normal(ks[7], (D,)) * 0.1
    dtbb = jax.random.normal(ks[8], (D,)) * 0.1
    Af = -jnp.exp(jax.random.normal(ks[9], (D, N)) * 0.3)
    Ab = -jnp.exp(jax.random.normal(ks[10], (D, N)) * 0.3)
    Df = jax.random.normal(ks[11], (D,))
    Db = jax.random.normal(ks[12], (D,))

    args = (u, gate, cw, cb, wx, wdt, bdt, dtbf, dtbb, Af, Ab, Df, Db,
            dt_rank)
    ref = _fused_bissm_ref(*args)
    got = fused_bidir_ssm(*args, interpret=True)
    assert jnp.max(jnp.abs(ref - got)) < 1e-4

    # even-k conv padding convention matches XLA SAME (lo=(k-1)//2)
    cw4 = cw[:4]
    a4 = (u, gate, cw4, cb, wx, wdt, bdt, dtbf, dtbb, Af, Ab, Df, Db,
          dt_rank)
    assert jnp.max(jnp.abs(_fused_bissm_ref(*a4)
                           - fused_bidir_ssm(*a4, interpret=True))) < 1e-4


def test_fused_bissm_gradients_flow():
    """The custom VJP (composed-reference backward) produces finite grads
    for every parameter."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.nn.ssm import bissm_apply, bissm_init

    p = bissm_init(jax.random.PRNGKey(0), dim=8, state_dim=4,
                   conv_kernel=5)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 5, 8), jnp.float32)

    def loss(p, impl):
        return jnp.sum(bissm_apply(p, x, impl=impl) ** 2)

    gf = jax.grad(lambda p: loss(p, "fused"))(p)
    gc = jax.grad(lambda p: loss(p, "composed"))(p)
    flat_f = jax.tree_util.tree_leaves(gf)
    flat_c = jax.tree_util.tree_leaves(gc)
    assert all(bool(jnp.all(jnp.isfinite(a))) for a in flat_f)
    for a, b in zip(flat_f, flat_c):
        assert jnp.max(jnp.abs(a - b)) < 1e-3 * (1 + jnp.max(jnp.abs(b)))


def test_bissm_fused_matches_composed_apply():
    """bissm_apply(impl='fused') equals impl='composed' (CPU routes both
    through pure-XLA paths; the fp32 interior may differ from the bf16
    composed path only at rounding level)."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.nn.ssm import bissm_apply, bissm_init

    p = bissm_init(jax.random.PRNGKey(3), dim=12, state_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(4), (10, 6, 12), jnp.float32)
    yf = bissm_apply(p, x, impl="fused")
    yc = bissm_apply(p, x, impl="composed")
    assert jnp.max(jnp.abs(yf - yc)) < 5e-4
