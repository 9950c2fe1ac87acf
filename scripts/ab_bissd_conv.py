"""A/B the bissd depthwise-conv impl (halo Pallas kernel vs grouped conv)
inside full VSRM, same process, two rounds each."""
import functools

import jax
import jax.numpy as jnp

from video_enhancer_tpu.utils.timing import device_time_per_call
from video_enhancer_tpu.models import vsrm

_orig = vsrm.bissd_apply


def bf16(p):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 and a.ndim >= 2 else a, p)


def run(tag, conv_impl):
    vsrm.bissd_apply = functools.partial(_orig, conv_impl=conv_impl)
    pv, _ = vsrm.init(jax.random.PRNGKey(0), dim=64, num_blocks=6, scale=4)
    xv = jax.random.uniform(jax.random.PRNGKey(1), (1, 7, 180, 320, 3),
                            jnp.bfloat16)
    sv = device_time_per_call(lambda xx: vsrm.apply(bf16(pv), xx, scale=4),
                              xv, n_small=2, n_large=6)
    print(f"{tag} vsrm: {sv*1e3:.1f} ms", flush=True)


for phase, impl in (("grouped", "grouped"), ("pallas", "pallas"),
                    ("grouped2", "grouped"), ("pallas2", "pallas")):
    run(phase, impl)
