"""Numerics tests for basic ops vs cv2 / torch-cpu oracles."""

import numpy as np
import pytest


def test_resize_bicubic_matches_cv2_upscale():
    import cv2
    import jax.numpy as jnp

    from video_enhancer_tpu.ops import resize

    rng = np.random.default_rng(0)
    img = rng.random((24, 32, 3), dtype=np.float32)
    ours = np.asarray(resize(jnp.asarray(img), (48, 64), method="cubic"))
    ref = cv2.resize(img, (64, 48), interpolation=cv2.INTER_CUBIC)
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_resize_bicubic_matches_torch():
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from video_enhancer_tpu.ops import resize

    rng = np.random.default_rng(1)
    img = rng.random((20, 28, 3), dtype=np.float32)
    ours = np.asarray(
        resize(jnp.asarray(img), (45, 63), method="cubic", antialias=False)
    )
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    ref = (
        F.interpolate(t, size=(45, 63), mode="bicubic", align_corners=False)[0]
        .permute(1, 2, 0)
        .numpy()
    )
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_resize_bilinear_matches_cv2():
    import cv2
    import jax.numpy as jnp

    from video_enhancer_tpu.ops import resize

    rng = np.random.default_rng(2)
    img = rng.random((16, 16, 3), dtype=np.float32)
    ours = np.asarray(resize(jnp.asarray(img), (37, 41), method="linear"))
    ref = cv2.resize(img, (41, 37), interpolation=cv2.INTER_LINEAR)
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_resize_area_downscale_matches_cv2():
    import cv2
    import jax.numpy as jnp

    from video_enhancer_tpu.ops import resize

    rng = np.random.default_rng(3)
    img = rng.random((64, 64, 3), dtype=np.float32)
    ours = np.asarray(resize(jnp.asarray(img), (16, 16), method="area"))
    ref = cv2.resize(img, (16, 16), interpolation=cv2.INTER_AREA)
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_resize_batched_video():
    import jax.numpy as jnp

    from video_enhancer_tpu.ops import resize_video

    vid = jnp.ones((2, 4, 8, 8, 3))
    out = resize_video(vid, (16, 16))
    assert out.shape == (2, 4, 16, 16, 3)


def test_pixel_shuffle_matches_torch():
    import jax.numpy as jnp
    import torch

    from video_enhancer_tpu.ops import pixel_shuffle, pixel_unshuffle

    rng = np.random.default_rng(4)
    x = rng.random((2, 5, 6, 12), dtype=np.float32)  # C=12=3*2*2
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.pixel_shuffle(t, 2).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, ref)

    back = np.asarray(pixel_unshuffle(jnp.asarray(ours), 2))
    assert np.allclose(back, x)


def test_conv2d_matches_torch():
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from video_enhancer_tpu.ops import conv2d

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 9, 11, 4), dtype=np.float32)
    w = rng.standard_normal((3, 3, 4, 8), dtype=np.float32)
    b = rng.standard_normal(8, dtype=np.float32)
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    ref = (
        F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w).permute(3, 2, 0, 1),
            torch.from_numpy(b),
            padding=1,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_conv3d_matches_torch():
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from video_enhancer_tpu.ops import conv3d

    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 5, 6, 7, 3), dtype=np.float32)
    w = rng.standard_normal((1, 3, 3, 3, 16), dtype=np.float32)
    ours = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w)))
    ref = (
        F.conv3d(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3),
            torch.from_numpy(w).permute(4, 3, 0, 1, 2),
            padding=(0, 1, 1),
        )
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_flow_warp_identity_and_shift():
    import jax.numpy as jnp

    from video_enhancer_tpu.ops import flow_warp

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((8, 8, 3), dtype=np.float32))
    out = flow_warp(img, jnp.zeros((8, 8, 2)))
    assert np.allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    # Integer shift by +1 row: out[y,x] = img[y+1,x]
    flow = jnp.zeros((8, 8, 2)).at[..., 0].set(1.0)
    out = np.asarray(flow_warp(img, flow))
    assert np.allclose(out[:-1], np.asarray(img)[1:], atol=1e-6)


def test_flow_warp_packings_match_grid_sample():
    """Both gather packings (1-gather 4C for C<=32, 2-gather 2C above)
    must equal the per-pixel grid_sample reference on fractional flows."""
    import jax.numpy as jnp

    from video_enhancer_tpu.ops.warp import flow_warp, grid_sample

    rng = np.random.default_rng(3)
    for c in (3, 64):  # exercises each branch
        img = jnp.asarray(rng.random((2, 9, 11, c), dtype=np.float32))
        flow = jnp.asarray(
            (rng.random((2, 9, 11, 2), dtype=np.float32) - 0.5) * 6.0)
        out = np.asarray(flow_warp(img, flow))
        yy = np.arange(9, dtype=np.float32)[:, None]
        xx = np.arange(11, dtype=np.float32)[None, :]
        for b in range(2):
            coords = jnp.asarray(
                np.stack([yy + np.asarray(flow)[b, ..., 0],
                          xx + np.asarray(flow)[b, ..., 1]], axis=-1))
            ref = np.asarray(grid_sample(img[b], coords))
            assert np.allclose(out[b], ref, atol=1e-5), f"C={c}"


def test_overlap_add_blend_uniform():
    import jax.numpy as jnp

    from video_enhancer_tpu.ops import overlap_add_blend

    # Two overlapping constant tiles must blend to the same constant.
    tiles = jnp.ones((2, 8, 8, 3)) * 5.0
    origins = jnp.asarray([[0, 0], [0, 4]])
    out = overlap_add_blend(tiles, origins, (8, 12), overlap=4)
    assert np.allclose(np.asarray(out), 5.0, atol=1e-5)


def test_tiny_temporal_conv3d_matches_lax():
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.ops import conv as convmod

    # (kt,1,1) conv with <=8 channels routes through the unrolled
    # channel-broadcast FMA path — must equal the lax lowering exactly.
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 6, 5, 7, 3), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 1, 3, 4),
                          jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (4,), jnp.float32)
    fast = convmod.conv3d(x, w, b)
    import jax.lax as lax
    ref = lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC")) + b
    assert np.allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)


def test_rdb_scatter_form_matches_textbook():
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.models.realesrgan import _rdb_apply, _rdb_init
    from video_enhancer_tpu.nn import core as nn

    # The scatter (source-fused) RDB is an exact reassociation of the
    # textbook concat form: conv_i(concat(srcs)) = sum_s conv(src_s,
    # W_i[slice_s]).
    convs = _rdb_init(jax.random.PRNGKey(0), 16, 8)
    h = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 7, 16),
                          jnp.float32)

    def rdb_textbook(convs, x):
        feats = [x]
        for conv in convs[:-1]:
            hh = jax.nn.leaky_relu(
                nn.conv2d_apply(conv, jnp.concatenate(feats, -1)), 0.2)
            feats.append(hh)
        out = nn.conv2d_apply(convs[-1], jnp.concatenate(feats, -1))
        return x + 0.2 * out

    a = rdb_textbook(convs, h)
    b = _rdb_apply(convs, h)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_depthwise_conv1d_silu_kernel_matches_ref():
    """Chunked halo kernel (interpret) == silu(grouped conv SAME), incl.
    chunk-boundary halos and ragged tails."""
    import jax
    import jax.numpy as jnp

    from video_enhancer_tpu.ops.conv import (_dwconv_silu_impl,
                                             _dwconv_silu_ref)

    for L, k in ((70, 5), (64, 4), (37, 3)):
        x = jax.random.normal(jax.random.PRNGKey(L), (3, L, 16),
                              jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(k), (k, 1, 16)) * 0.4
        b = jax.random.normal(jax.random.PRNGKey(7), (16,)) * 0.1
        ref = _dwconv_silu_ref(x, w, b)
        got = _dwconv_silu_impl(x, w, b, chunk=32, interpret=True)
        assert jnp.max(jnp.abs(ref - got)) < 1e-5, (L, k)
