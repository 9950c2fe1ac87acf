"""Flash attention vs reference; reference vs torch."""

import numpy as np


def _qkv(B=2, H=3, Lq=96, Lk=96, Dh=32, seed=0):
    import jax

    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 3)
    q = jax.random.normal(ks[0], (B, H, Lq, Dh))
    kk = jax.random.normal(ks[1], (B, H, Lk, Dh))
    v = jax.random.normal(ks[2], (B, H, Lk, Dh))
    return q, kk, v


def test_reference_matches_torch_sdpa():
    import jax.numpy as jnp
    import torch

    from video_enhancer_tpu.ops.attention import attention_ref

    q, k, v = _qkv(seed=1)
    ours = np.asarray(attention_ref(q, k, v))
    ref = (
        torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(np.asarray(q)),
            torch.from_numpy(np.asarray(k)),
            torch.from_numpy(np.asarray(v)),
        )
        .numpy()
    )
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_flash_matches_reference():
    from video_enhancer_tpu.ops.attention import attention_ref, flash_attention

    q, k, v = _qkv(B=1, H=2, Lq=160, Lk=224, Dh=32, seed=2)
    ref = np.asarray(attention_ref(q, k, v))
    ours = np.asarray(flash_attention(q, k, v, block_q=64, block_k=64, interpret=True))
    assert np.max(np.abs(ours - ref)) < 2e-5


def test_flash_ragged_lengths():
    """Lq/Lk not multiples of block sizes exercises the padding/mask path."""
    from video_enhancer_tpu.ops.attention import attention_ref, flash_attention

    q, k, v = _qkv(B=1, H=1, Lq=37, Lk=53, Dh=16, seed=3)
    ref = np.asarray(attention_ref(q, k, v))
    ours = np.asarray(flash_attention(q, k, v, block_q=16, block_k=16, interpret=True))
    assert np.max(np.abs(ours - ref)) < 2e-5


def test_attention_with_bias():
    import jax

    from video_enhancer_tpu.ops.attention import attention, attention_ref

    q, k, v = _qkv(B=1, H=2, Lq=16, Lk=16, seed=4)
    bias = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 16, 16))
    out = attention(q, k, v, bias=bias)
    ref = attention_ref(q, k, v, bias=bias)
    assert np.allclose(np.asarray(out), np.asarray(ref))


def test_site_attention_matches_reference():
    """The broadcast (lane-preserving) form must equal per-head attention
    exactly: q (N,T,C) with `heads` -> same result as attention_ref on the
    (N, heads, T, dh) layout."""
    import jax

    from video_enhancer_tpu.ops.attention import attention_ref, site_attention

    n, t, tg, c, heads = 6, 5, 7, 32, 4
    dh = c // heads
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (n, t, c))
    k = jax.random.normal(ks[1], (n, tg, c))
    v = jax.random.normal(ks[2], (n, tg, c))

    out = site_attention(q, k, v, heads)

    def mh(z):
        return z.reshape(n, z.shape[1], heads, dh).transpose(0, 2, 1, 3)

    ref = attention_ref(mh(q), mh(k), mh(v))
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(n, t, c))
    assert np.max(np.abs(np.asarray(out) - ref)) < 1e-5


def test_window_attention_matches_reference():
    """Fused windowed-attention kernel (interpret mode on CPU) == the
    reference formula, bias included (the rvrt swin shape, scaled down)."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.ops.attention import (attention_ref,
                                                  window_attention)

    nw, h, n, d = 10, 2, 32, 16  # nw*h=20, group clamps to a multiple of h
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (nw, h, n, d), jnp.float32)
    k = jax.random.normal(ks[1], (nw, h, n, d), jnp.float32)
    v = jax.random.normal(ks[2], (nw, h, n, d), jnp.float32)
    bias = jax.random.normal(ks[3], (h, n, n), jnp.float32)

    out = window_attention(q, k, v, bias, group=4, interpret=True)
    ref = attention_ref(q, k, v, bias=bias[None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # Padding path: nw*h=20 not a multiple of group=8.
    out8 = window_attention(q, k, v, bias, group=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_window_attention_diffable_grads():
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.ops.attention import (attention_ref,
                                                  window_attention_diffable)

    nw, h, n, d = 4, 2, 16, 8
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (nw, h, n, d), jnp.float32)
    k = jax.random.normal(ks[1], (nw, h, n, d), jnp.float32)
    v = jax.random.normal(ks[2], (nw, h, n, d), jnp.float32)
    bias = jax.random.normal(ks[3], (h, n, n), jnp.float32) * 0.1
    scale = d ** -0.5

    def loss_kernel(qq, kk, vv, bb):
        return jnp.sum(window_attention_diffable(qq, kk, vv, bb, scale) ** 2)

    def loss_ref(qq, kk, vv, bb):
        return jnp.sum(attention_ref(qq, kk, vv, bias=bb[None],
                                     scale=scale) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)
