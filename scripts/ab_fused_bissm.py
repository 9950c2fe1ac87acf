"""A/B the fused one-kernel bissm vs the composed five-op path, in situ.

Same-process FMV + VSRM timings with bissm_apply forced to each impl, two
rounds each, so tunnel variance cancels (pattern: scripts/ab_dwconv.py).
"""
import functools

import jax
import jax.numpy as jnp

from video_enhancer_tpu.utils.timing import device_time_per_call
from video_enhancer_tpu.nn import ssm as ssm_mod
from video_enhancer_tpu.models import fast_mamba_vsr as fmv
from video_enhancer_tpu.models import vsrm

_orig = ssm_mod.bissm_apply


def bf16(p):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 and a.ndim >= 2 else a, p)


def run(tag, impl):
    for mod in (fmv, vsrm):
        mod.bissm_apply = functools.partial(_orig, impl=impl)
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


for phase, impl in (("composed", "composed"), ("fused", "fused"),
                    ("composed2", "composed"), ("fused2", "fused")):
    run(phase, impl)
