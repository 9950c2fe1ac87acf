"""A/B the depthwise_conv1d implementations inside full models, one process.

Times FMV and VSRM twice in the SAME process — once with the grouped-conv
form, once with the unrolled shift-FMA form — so tunnel run-to-run variance
cancels. Monkeypatches nn.ssm's imported symbol (models call through it).
"""
import jax
import jax.numpy as jnp
from jax import lax

from video_enhancer_tpu.utils.timing import device_time_per_call
from video_enhancer_tpu.nn import ssm as ssm_mod
from video_enhancer_tpu.ops import conv as conv_mod
from video_enhancer_tpu.models import fast_mamba_vsr as fmv
from video_enhancer_tpu.models import vsrm


def grouped_dwconv1d(x, w, b=None, padding="SAME"):
    out = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def bf16(p):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 and a.ndim >= 2 else a, p)


def run(tag):
    pf, _ = fmv.init(jax.random.PRNGKey(0), dim=48, num_layers=8, scale=4)
    xf = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 180, 320, 3),
                            jnp.bfloat16)
    sf = device_time_per_call(lambda xx: fmv.apply(bf16(pf), xx, scale=4),
                              xf, n_small=2, n_large=6)
    print(f"{tag} fmv: {sf*1e3:.1f} ms", flush=True)
    pv, _ = vsrm.init(jax.random.PRNGKey(0), dim=64, num_blocks=6, scale=4)
    xv = jax.random.uniform(jax.random.PRNGKey(1), (1, 7, 180, 320, 3),
                            jnp.bfloat16)
    sv = device_time_per_call(lambda xx: vsrm.apply(bf16(pv), xx, scale=4),
                              xv, n_small=2, n_large=6)
    print(f"{tag} vsrm: {sv*1e3:.1f} ms", flush=True)


unrolled = conv_mod.depthwise_conv1d
for phase in ("grouped", "unrolled", "grouped2", "unrolled2"):
    impl = grouped_dwconv1d if phase.startswith("grouped") else unrolled
    ssm_mod.depthwise_conv1d = impl
    run(phase)
