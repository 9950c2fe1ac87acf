"""Trace-time analytic FLOP accounting (utils/flops.py).

Round-2 weakness: XLA cost analysis counts every pallas_call as 0 FLOPs,
so MFU for Pallas-heavy models was a lower bound. These tests pin the
accounting totals the Pallas wrappers record against hand counts, and the
no-double-count rule (only Pallas paths record; pure-XLA paths don't).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_enhancer_tpu.utils import flops as facc


def test_record_outside_scope_is_noop():
    facc.record(123.0)  # must not raise or leak anywhere
    with facc.accounting() as acc:
        facc.record(2.0)
        with facc.accounting() as inner:
            facc.record(5.0)
        assert inner[0] == 5.0
    assert acc[0] == 2.0  # inner scope did not leak into outer


def test_short_scan_records_analytic_flops():
    from video_enhancer_tpu.ops.scan import selective_scan_pallas_short

    B, L, D, N = 64, 8, 16, 8
    x = jnp.ones((B, L, D))
    dt = jnp.full((B, L, D), 0.1)
    A = -jnp.ones((D, N))
    Bm = jnp.ones((B, L, N))
    C = jnp.ones((B, L, N))
    Dv = jnp.ones((D,))

    def f(x, dt, Bm, C):
        y, _ = selective_scan_pallas_short(x, dt, A, Bm, C, Dv,
                                           need_state=False)
        return y

    with facc.accounting() as acc:
        jax.jit(f).lower(x, dt, Bm, C)
    assert acc[0] == pytest.approx(9.0 * B * L * D * N + 2.0 * B * L * D)


def test_flash_attention_records_4bhlld():
    from video_enhancer_tpu.ops.attention import flash_attention

    B, H, L, D = 2, 2, 128, 32
    q = jnp.ones((B, H, L, D), jnp.bfloat16)
    with facc.accounting() as acc:
        jax.jit(lambda q: flash_attention(q, q, q)).lower(q)
    assert acc[0] == pytest.approx(4.0 * B * H * L * L * D)


def test_ssd_shared_pallas_records_but_jnp_does_not():
    from video_enhancer_tpu.ops.ssd import ssd_shared

    b, L, H, P, N = 1, 256, 2, 16, 8
    x = jnp.ones((b, L, H, P))
    dt = jnp.full((b, L, H), 0.1)
    A = -jnp.ones((H,))
    Bm = jnp.ones((b, L, N))
    Cm = jnp.ones((b, L, N))

    with facc.accounting() as acc_jnp:
        jax.jit(lambda x, dt, Bm, Cm: ssd_shared(
            x, dt, A, Bm, Cm, use_pallas=False)).lower(x, dt, Bm, Cm)
    assert acc_jnp[0] == 0.0  # pure-XLA path: counted by cost analysis

    with facc.accounting() as acc:
        jax.jit(lambda x, dt, Bm, Cm: ssd_shared(
            x, dt, A, Bm, Cm, use_pallas=True)).lower(x, dt, Bm, Cm)
    Q = 256
    K = 1
    expect = b * K * (2.0 * Q * Q * N
                      + H * (2.0 * Q * Q * (P + 1) + 4.0 * Q * N * P))
    assert acc[0] == pytest.approx(expect)


def test_bidir_scan_records_two_streams():
    from video_enhancer_tpu.ops.scan import selective_scan_bidir

    B, L, D, N = 8, 16, 8, 4
    x = jnp.ones((B, L, D))
    dt = jnp.full((B, L, D), 0.1)
    A = -jnp.ones((D, N))
    Bm = jnp.ones((B, L, N))
    C = jnp.ones((B, L, N))
    Dv = jnp.ones((D,))
    with facc.accounting() as acc:
        jax.jit(lambda x, dt, Bm, C: selective_scan_bidir(
            x, dt, A, Bm, C, Dv, x, dt, A, Bm, C, Dv,
            interpret=True)[0]).lower(x, dt, Bm, C)
    assert acc[0] == pytest.approx(
        2 * (9.0 * B * L * D * N + 2.0 * B * L * D))


def test_timing_estimator_is_sane_on_cpu():
    """device_time_per_call returns a positive finite slope and respects
    the physical max_flops floor (the >100%-of-peak clamp)."""
    from video_enhancer_tpu.utils.timing import device_time_per_call

    a = jnp.ones((256, 256))

    def f(a):
        return a @ a

    sec = device_time_per_call(f, a, n_small=2, n_large=6, repeats=2)
    assert np.isfinite(sec) and sec > 0

    # An absurdly large analytic FLOP count forces the clamp: the result
    # can never imply more than peak throughput.
    huge = 1e18
    sec2 = device_time_per_call(f, a, n_small=2, n_large=6, repeats=2,
                                max_flops=huge)
    assert sec2 >= huge / 197e12
