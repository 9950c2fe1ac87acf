"""Stage-ablation profiler for rife / rvrt / seedvr2 (round-5 verdict
item 8 + weak #6).

Times progressively larger prefixes of each model's forward with the
slope method (utils/timing.py), attributing wall time to stages without
jax.profiler (whose trace collection is unreliable through the TPU
tunnel). Usage: python scripts/profile_ablate.py {rife,rvrt,seedvr2} [T]
"""
import sys

sys.path.insert(0, ".")

from video_enhancer_tpu.utils.jaxenv import setup  # noqa: E402

setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from video_enhancer_tpu.utils.timing import device_time_per_call  # noqa


def bf16(p):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p)


def time_fn(name, fn, *args):
    sec = device_time_per_call(fn, *args, n_small=2, n_large=6)
    print(f"{name:34s} {sec * 1e3:8.2f} ms", flush=True)
    return sec


def profile_rife():
    from video_enhancer_tpu import nn
    from video_enhancer_tpu.models import rife
    from video_enhancer_tpu.ops.warp import flow_warp

    t, h, w = 8, 360, 640
    params, _ = rife.init(jax.random.PRNGKey(0))
    pb = bf16(params)
    a = jax.random.uniform(jax.random.PRNGKey(1), (t, h, w, 3),
                           jnp.bfloat16)
    b = jax.random.uniform(jax.random.PRNGKey(2), (t, h, w, 3),
                           jnp.bfloat16)
    flow = jax.random.uniform(jax.random.PRNGKey(3), (t, h, w, 4),
                              jnp.bfloat16) * 4.0

    time_fn("full interpolate_pair",
            lambda aa, bb: rife.interpolate_pair(pb, aa, bb), a, b)
    time_fn("one full-res warp", lambda f, fl: flow_warp(f, fl[..., :2]),
            a, flow)
    time_fn("two full-res warps (separate)",
            lambda f0, f1, fl: flow_warp(f0, fl[..., :2])
            + flow_warp(f1, fl[..., 2:]), a, b, flow)
    time_fn("two warps (batch-concat)",
            lambda f0, f1, fl: jnp.sum(flow_warp(
                jnp.concatenate([f0, f1], 0),
                jnp.concatenate([fl[..., :2], fl[..., 2:]], 0)),
                axis=0, keepdims=True), a, b, flow)

    def refine_only(mid, fl):
        ref_in = jnp.concatenate([mid, mid, mid, fl], axis=-1)
        r = jax.nn.leaky_relu(nn.conv2d_apply(pb["refine1"], ref_in), 0.2)
        return mid + nn.conv2d_apply(pb["refine2"], r)

    time_fn("refine convs (full res)", refine_only, a, flow)


def profile_rvrt():
    from video_enhancer_tpu import nn
    from video_enhancer_tpu.models import rvrt
    from video_enhancer_tpu.models.rvrt import (_relpos_index, _swin_block,
                                                pixel_shuffle)
    from video_enhancer_tpu.ops import resize

    t, h, w = 8, 180, 320
    params, _ = rvrt.init(jax.random.PRNGKey(0), scale=4)
    pb = bf16(params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, t, h, w, 3),
                           jnp.bfloat16)

    window = (2, 8, 8)
    relpos = jnp.asarray(_relpos_index(window))
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 4), (0, 0), (0, 0)), mode="edge")

    time_fn("full apply", lambda xx: rvrt.apply(pb, xx, scale=4), x)
    time_fn("embed conv3d",
            lambda xx: nn.conv3d_apply(pb["embed"], xx), xp)
    feats = nn.conv3d_apply(pb["embed"], xp)

    def blocks_only(f):
        for i, blk in enumerate(pb["blocks"]):
            f = _swin_block(blk, f, 4, window, shift=bool(i % 2),
                            relpos_idx=relpos)
        return f

    time_fn("4x swin blocks", blocks_only, feats)

    def one_block(f):
        return _swin_block(pb["blocks"][0], f, 4, window, shift=False,
                           relpos_idx=relpos)

    time_fn("1x swin block", one_block, feats)

    def attn_only(f):
        blk = pb["blocks"][0]
        from video_enhancer_tpu.models.rvrt import (_window_partition,
                                                    _window_reverse)
        from video_enhancer_tpu.ops.attention import attention_ref

        wins = _window_partition(f, window)
        nW, N, c = wins.shape
        q, k, v = jnp.split(nn.dense_apply(blk["qkv"], wins), 3, axis=-1)

        def mh(z):
            return z.reshape(nW, N, 4, c // 4).transpose(0, 2, 1, 3)

        bias = blk["bias_table"][relpos].transpose(2, 0, 1)[None]
        a = attention_ref(mh(q), mh(k), mh(v), bias=bias)
        return _window_reverse(
            a.transpose(0, 2, 1, 3).reshape(nW, N, c), window, f.shape)

    time_fn("qkv+windowed attention (1 block)", attn_only, feats)

    def recon_head(f):
        f = jax.nn.silu(nn.conv3d_apply(pb["recon"], f))
        return pixel_shuffle(nn.conv3d_apply(pb["head"], f), 4)

    time_fn("recon+head+pixel_shuffle", recon_head, feats)
    time_fn("cubic 4x base resize",
            lambda xx: resize(xx, (h * 4, w * 4), method="cubic",
                              antialias=False), x)


def profile_seedvr2():
    from video_enhancer_tpu.models import seedvr2
    from video_enhancer_tpu.models.diffusion import unet_apply
    from video_enhancer_tpu.models.seedvr2 import (_flownet_apply,
                                                   _tc_apply)
    from video_enhancer_tpu.ops.warp import flow_warp

    t, s = 8, 256  # the bench shape (bench.py seedvr2_256_restore)
    params, _ = seedvr2.init(jax.random.PRNGKey(0))
    pb = bf16(params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, t, s, s, 3),
                           jnp.bfloat16)

    time_fn("full apply (s=1, pure model)",
            lambda xx: seedvr2.apply(pb, xx, strength=1.0), x)
    xin = jnp.concatenate([x, x], axis=-1)  # (B,T,H,W,6) UNet input
    tf = jnp.full((1,), 500.0, jnp.float32)
    time_fn("unet_apply", lambda xx: unet_apply(pb["unet"], xx, tf), xin)
    time_fn("tc module (attn+flow+warp+fuse)",
            lambda xx: _tc_apply(pb["tc"], xx), x)
    f2 = x.reshape(t, s, s, 3)
    time_fn("tc: flownet",
            lambda aa, bb: _flownet_apply(pb["tc"]["flow"], aa, bb), f2, f2)
    flow = jax.random.uniform(jax.random.PRNGKey(2), (t, s, s, 2),
                              jnp.bfloat16) * 2.0
    time_fn("tc: flow_warp", lambda ff, fl: flow_warp(ff, fl), f2, flow)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "rife"
    {"rife": profile_rife, "rvrt": profile_rvrt,
     "seedvr2": profile_seedvr2}[which]()
