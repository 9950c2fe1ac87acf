"""Selective SSM (Mamba) layer: init/apply over arbitrary sequence axes.

Clean re-specification of the reference's ``EfficientSSM`` (reference
ea_mamba_blocks.py:39-147 — whose Python-loop scan mean-pools dt/x and is the
framework's worst hot spot). Parameterization follows standard Mamba:

    in_proj -> (x, gate); depthwise conv1d over L; SiLU;
    x_proj -> (dt_raw, B, C); dt = softplus(dt_proj(dt_raw) + bias)
    selective scan (ops/scan.py Pallas kernel); y * silu(gate); out_proj

Sequence layout: ``(batch, L, dim)``. The caller chooses what "L" means:
the temporal axis (FastMambaVSR propagation), a flattened spatial raster
(VSRM spatial mixing), etc.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.conv import depthwise_conv1d
from ..ops.scan import selective_scan
from .core import dense_apply, dense_init

__all__ = ["ssm_init", "ssm_apply", "bimamba_init", "bimamba_apply",
           "bimamba_apply_sharded", "mamba2_init", "mamba2_apply",
           "bimamba2_init", "bimamba2_apply", "bissd_init", "bissd_apply",
           "bissd_apply_sharded", "bissm_init", "bissm_apply",
           "bissm_apply_sharded"]


def ssm_init(key, dim: int, state_dim: int = 16, expand: int = 2,
             conv_kernel: int = 4, dt_rank: int | None = None):
    inner = dim * expand
    dt_rank = dt_rank or max(dim // 16, 1)
    ks = jax.random.split(key, 6)
    # S4D-real initialization of A (negative, log-spaced decay rates).
    a = jnp.tile(
        jnp.arange(1, state_dim + 1, dtype=jnp.float32)[None, :], (inner, 1)
    )
    dt_bias = jnp.log(
        jnp.exp(
            jnp.exp(
                jax.random.uniform(ks[4], (inner,), jnp.float32)
                * (math.log(0.1) - math.log(0.001))
                + math.log(0.001)
            )
        )
        - 1.0
        + 1e-9
    )  # inverse-softplus of dt in [1e-3, 1e-1]
    return {
        "in_proj": dense_init(ks[0], dim, 2 * inner, bias=False),
        "conv_w": jax.random.normal(ks[1], (conv_kernel, 1, inner), jnp.float32)
        * (1.0 / math.sqrt(conv_kernel)),
        "conv_b": jnp.zeros((inner,), jnp.float32),
        "x_proj": dense_init(ks[2], inner, dt_rank + 2 * state_dim, bias=False),
        "dt_proj": dense_init(ks[3], dt_rank, inner),
        "dt_bias": dt_bias,
        "A_log": jnp.log(a),
        "D": jnp.ones((inner,), jnp.float32),
        "out_proj": dense_init(ks[5], inner, dim, bias=False),
    }


def _ssm_streams(p, x: jnp.ndarray, reverse: bool):
    """Projection + conv + dt streams in NATURAL sequence order.

    For the reverse direction the flip->causal-conv->unflip of the naive
    formulation is algebraically an anti-causal conv with tap-reversed
    weights — no data movement.
    """
    state_dim = p["A_log"].shape[1]
    dt_rank = p["x_proj"]["w"].shape[1] - 2 * state_dim

    xz = dense_apply(p["in_proj"], x)
    u, gate = jnp.split(xz, 2, axis=-1)
    k = p["conv_w"].shape[0]
    w = p["conv_w"].astype(u.dtype)
    if reverse:
        u = depthwise_conv1d(u, jnp.flip(w, axis=0), p["conv_b"],
                             padding=((0, k - 1),))
    else:
        u = depthwise_conv1d(u, w, p["conv_b"], padding=((k - 1, 0),))
    u = jax.nn.silu(u)

    proj = dense_apply(p["x_proj"], u)
    dt_raw = proj[..., :dt_rank]
    Bmat = proj[..., dt_rank:dt_rank + state_dim]
    Cmat = proj[..., dt_rank + state_dim:]
    dt = jax.nn.softplus(dense_apply(p["dt_proj"], dt_raw) + p["dt_bias"])
    return u, gate, dt, Bmat, Cmat


def ssm_apply(p, x: jnp.ndarray, reverse: bool = False,
              impl: str | None = None) -> jnp.ndarray:
    """x: (B, L, dim) -> (B, L, dim)."""
    u, gate, dt, Bmat, Cmat = _ssm_streams(p, x, reverse=reverse)
    if reverse:
        # Non-fused fallback: scan the reversed views (the fused bidir
        # kernel in bimamba_apply avoids these flips entirely).
        flip = lambda a: jnp.flip(a, axis=1)
        A = -jnp.exp(p["A_log"])
        y, _ = selective_scan(flip(u), flip(dt), A, flip(Bmat), flip(Cmat),
                              p["D"], impl=impl, need_state=False)
        y = flip(y)
    else:
        A = -jnp.exp(p["A_log"])
        y, _ = selective_scan(u, dt, A, Bmat, Cmat, p["D"], impl=impl,
                              need_state=False)
    y = y * jax.nn.silu(gate)
    return dense_apply(p["out_proj"], y)


def bimamba_init(key, dim: int, **kw):
    """Bidirectional Mamba (reference BiMambaLayer, ea_mamba_blocks.py:284-362):
    forward + reversed scans, concat, linear fuse."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fwd": ssm_init(k1, dim, **kw),
        "bwd": ssm_init(k2, dim, **kw),
        "fuse": dense_init(k3, 2 * dim, dim),
    }


def bimamba_apply_sharded(p, x: jnp.ndarray, axis_name: str = "time",
                          impl: str | None = None) -> jnp.ndarray:
    """EXACT bidirectional bimamba over a sequence sharded across
    ``axis_name`` (inside shard_map). x: local shard (B, L_loc, dim).

    Two cross-shard couplings are handled: the depthwise conv's receptive
    field (k-1 halo frames exchanged; halos zeroed at global sequence edges
    to match the unsharded zero padding) and the scan state
    (temporal_parallel_scan's prefix-combine).
    """
    from ..parallel.temporal import halo_exchange_time, temporal_parallel_scan

    k = p["fwd"]["conv_w"].shape[0]
    halo = k - 1
    if x.shape[1] < halo:
        raise ValueError(
            f"local T shard ({x.shape[1]} frames) smaller than the conv "
            f"halo ({halo}); use fewer time shards or longer clips")
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    xh = halo_exchange_time(x, halo, axis_name=axis_name)
    # Zero halos at the global edges (the unsharded conv zero-pads there).
    left_live = (idx != 0).astype(x.dtype)
    right_live = (idx != n - 1).astype(x.dtype)
    xh = xh.at[:, :halo].multiply(left_live)
    xh = xh.at[:, -halo:].multiply(right_live)

    def trim(a):
        return a[:, halo:a.shape[1] - halo]

    outs = []
    for dname, reverse in (("fwd", False), ("bwd", True)):
        u, gate, dt, Bm, Cm = _ssm_streams(p[dname], xh, reverse=reverse)
        y = temporal_parallel_scan(
            trim(u), trim(dt), -jnp.exp(p[dname]["A_log"]), trim(Bm),
            trim(Cm), p[dname]["D"], axis_name=axis_name, impl=impl,
            reverse=reverse,
        )
        y = y * jax.nn.silu(trim(gate))
        outs.append(dense_apply(p[dname]["out_proj"], y))
    return dense_apply(p["fuse"], jnp.concatenate(outs, axis=-1))


def mamba2_init(key, dim: int, state_dim: int = 32, expand: int = 2,
                head_dim: int = 64, conv_kernel: int = 4):
    """Mamba-2 (SSD) layer: scalar-per-head decay so the scan runs in the
    chunked matmul form (ops/ssd.py) on the MXU. Used for LONG sequences
    (the VSRM spatial raster, L = H*W) where the per-(d,n)-decay Mamba-1
    scan is VPU-bound.

    in_proj -> (gate z, values x, shared B, shared C, per-head dt);
    causal depthwise conv over (x, B, C); SSD scan; gated RMS norm;
    out_proj.
    """
    inner = dim * expand
    if inner % head_dim:
        head_dim = inner  # tiny dims: one head
    heads = inner // head_dim
    ks = jax.random.split(key, 5)
    # A ~ -uniform[1, 16] per head (Mamba-2 init).
    a = jnp.exp(jax.random.uniform(ks[2], (heads,), jnp.float32,
                                   math.log(1.0), math.log(16.0)))
    dt_bias = jnp.log(jnp.exp(jnp.exp(
        jax.random.uniform(ks[3], (heads,), jnp.float32)
        * (math.log(0.1) - math.log(0.001)) + math.log(0.001))) - 1.0 + 1e-9)
    conv_dim = inner + 2 * state_dim
    return {
        "in_proj": dense_init(ks[0], dim,
                              2 * inner + 2 * state_dim + heads, bias=False),
        "conv_w": jax.random.normal(
            ks[1], (conv_kernel, 1, conv_dim), jnp.float32)
        * (1.0 / math.sqrt(conv_kernel)),
        "conv_b": jnp.zeros((conv_dim,), jnp.float32),
        "dt_bias": dt_bias,
        "A_log": jnp.log(a),
        "D": jnp.ones((inner,), jnp.float32),
        "norm_scale": jnp.ones((inner,), jnp.float32),
        "out_proj": dense_init(ks[4], inner, dim, bias=False),
    }


def mamba2_apply(p, x: jnp.ndarray, reverse: bool = False,
                 chunk: int = 256) -> jnp.ndarray:
    """x: (B, L, dim) -> (B, L, dim). ``reverse`` scans anti-causally
    (flip -> scan -> flip, with the conv done flip-free as in Mamba-1)."""
    from ..ops.ssd import ssd_shared

    heads = p["A_log"].shape[0]
    inner = p["D"].shape[0]
    state_dim = (p["conv_w"].shape[-1] - inner) // 2
    P = inner // heads

    zxbcdt = dense_apply(p["in_proj"], x)
    z = zxbcdt[..., :inner]
    xbc = zxbcdt[..., inner:inner + inner + 2 * state_dim]
    dt_raw = zxbcdt[..., -heads:]

    k = p["conv_w"].shape[0]
    w = p["conv_w"].astype(xbc.dtype)
    if reverse:
        xbc = depthwise_conv1d(xbc, jnp.flip(w, axis=0), p["conv_b"],
                               padding=((0, k - 1),))
    else:
        xbc = depthwise_conv1d(xbc, w, p["conv_b"], padding=((k - 1, 0),))
    xbc = jax.nn.silu(xbc)
    u = xbc[..., :inner]
    Bm = xbc[..., inner:inner + state_dim]
    Cm = xbc[..., inner + state_dim:]

    b, L, _ = x.shape
    dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + p["dt_bias"])
    A = -jnp.exp(p["A_log"])

    uh = u.reshape(b, L, heads, P)
    # B/C shared across heads (groups=1); the fused kernel broadcasts
    # in-register instead of materializing (b, L, H, N), and handles the
    # reverse direction flip-free.
    y = ssd_shared(uh, dt, A, Bm, Cm, chunk=chunk, reverse=reverse)
    y = y.reshape(b, L, inner) + u * p["D"].astype(u.dtype)

    # Gated RMS norm (Mamba-2): norm(y * silu(z)) * scale.
    y = y * jax.nn.silu(z)
    yf = y.astype(jnp.float32)
    y = (yf * jax.lax.rsqrt(jnp.mean(yf * yf, axis=-1, keepdims=True) + 1e-6)
         * p["norm_scale"]).astype(x.dtype)
    return dense_apply(p["out_proj"], y)


def bissd_init(key, dim: int, state_dim: int = 32, expand: int = 2,
               head_dim: int = 64, conv_kernel: int = 5):
    """Bidirectional SSD layer with SHARED projections: one in_proj and one
    centered (SAME-padded) depthwise conv feed BOTH scan directions, which
    differ only in their decay rates and dt biases. Halves the
    projection/conv cost of two full Mamba-2 layers; the two scans' outputs
    are summed before the gated norm. (Vim-style sharing; the scans remain
    exact anti-causal mirrors.)
    """
    inner = dim * expand
    if inner % head_dim:
        head_dim = inner
    heads = inner // head_dim
    ks = jax.random.split(key, 7)
    conv_dim = inner + 2 * state_dim

    def a_init(k):
        return jnp.exp(jax.random.uniform(k, (heads,), jnp.float32,
                                          math.log(1.0), math.log(16.0)))

    def dtb_init(k):
        return jnp.log(jnp.exp(jnp.exp(
            jax.random.uniform(k, (heads,), jnp.float32)
            * (math.log(0.1) - math.log(0.001)) + math.log(0.001)))
            - 1.0 + 1e-9)

    return {
        "in_proj": dense_init(ks[0], dim,
                              2 * inner + 2 * state_dim + heads, bias=False),
        "conv_w": jax.random.normal(
            ks[1], (conv_kernel, 1, conv_dim), jnp.float32)
        * (1.0 / math.sqrt(conv_kernel)),
        "conv_b": jnp.zeros((conv_dim,), jnp.float32),
        "A_log_f": jnp.log(a_init(ks[2])),
        "A_log_b": jnp.log(a_init(ks[3])),
        "dt_bias_f": dtb_init(ks[4]),
        "dt_bias_b": dtb_init(ks[5]),
        "D": jnp.ones((inner,), jnp.float32),
        "norm_scale": jnp.ones((inner,), jnp.float32),
        "out_proj": dense_init(ks[6], inner, dim, bias=False),
    }


def bissd_apply(p, x: jnp.ndarray, chunk: int = 256,
                conv_impl: str = "grouped",
                use_pallas: bool | None = None) -> jnp.ndarray:
    """x: (B, L, dim) -> (B, L, dim).

    conv_impl="grouped" (default) keeps the XLA grouped-conv path for the
    depthwise conv: although that lowering looks ~13x off roofline in
    isolation, the chunked halo kernel ("pallas", ops/conv.py
    depthwise_conv1d_silu) measured a consistent +7.5 ms REGRESSION at
    full-VSRM scale (123.0 -> 130.5 ms median over 6 interleaved rounds,
    scripts/ab_harness.py bissd_conv) — the same standalone-vs-in-situ
    inversion as the unrolled conv and the bmajor scan kernel."""
    from ..ops.ssd import ssd_shared

    heads = p["A_log_f"].shape[0]
    inner = p["D"].shape[0]
    state_dim = (p["conv_w"].shape[-1] - inner) // 2
    P = inner // heads

    zxbcdt = dense_apply(p["in_proj"], x)
    z = zxbcdt[..., :inner]
    xbc = zxbcdt[..., inner:inner + inner + 2 * state_dim]
    dt_raw = zxbcdt[..., -heads:].astype(jnp.float32)

    k = p["conv_w"].shape[0]
    if conv_impl == "pallas":
        from ..ops.conv import depthwise_conv1d_silu

        xbc = depthwise_conv1d_silu(xbc, p["conv_w"].astype(xbc.dtype),
                                    p["conv_b"])
    else:
        xbc = depthwise_conv1d(xbc, p["conv_w"].astype(xbc.dtype),
                               p["conv_b"], padding="SAME")
        xbc = jax.nn.silu(xbc)
    u = xbc[..., :inner]
    Bm = xbc[..., inner:inner + state_dim]
    Cm = xbc[..., inner + state_dim:]

    b, L, _ = x.shape
    uh = u.reshape(b, L, heads, P)
    dt_f = jax.nn.softplus(dt_raw + p["dt_bias_f"])
    dt_b = jax.nn.softplus(dt_raw + p["dt_bias_b"])
    y = (ssd_shared(uh, dt_f, -jnp.exp(p["A_log_f"]), Bm, Cm, chunk=chunk,
                    use_pallas=use_pallas)
         + ssd_shared(uh, dt_b, -jnp.exp(p["A_log_b"]), Bm, Cm, chunk=chunk,
                      reverse=True, use_pallas=use_pallas))
    y = y.reshape(b, L, inner) + u * p["D"].astype(u.dtype)

    y = y * jax.nn.silu(z)
    yf = y.astype(jnp.float32)
    y = (yf * jax.lax.rsqrt(jnp.mean(yf * yf, axis=-1, keepdims=True) + 1e-6)
         * p["norm_scale"]).astype(x.dtype)
    return dense_apply(p["out_proj"], y)


def bissd_apply_sharded(p, x: jnp.ndarray, axis_name: str = "time",
                        chunk: int = 64) -> jnp.ndarray:
    """EXACT bissd over a sequence sharded across ``axis_name`` (inside
    shard_map). x: local shard (B, L_loc, dim).

    Mirrors ``bissm_apply_sharded``: the centered SAME conv's receptive
    field is satisfied with a frame halo (zeroed at the global edges to
    match the unsharded zero padding) and both scan directions run the
    distributed prefix-combine (``parallel.temporal.ssd_parallel_scan``).
    The in_proj of a zero halo frame is zero (bias-free), so the conv
    reads the same zero context the unsharded SAME padding provides.
    """
    from ..parallel.temporal import halo_exchange_time, ssd_parallel_scan

    heads = p["A_log_f"].shape[0]
    inner = p["D"].shape[0]
    state_dim = (p["conv_w"].shape[-1] - inner) // 2
    P = inner // heads
    k = p["conv_w"].shape[0]
    halo = k // 2
    if x.shape[1] < halo:
        raise ValueError(
            f"local T shard ({x.shape[1]}) smaller than conv halo ({halo})")

    xh = halo_exchange_time(x, halo, axis_name=axis_name, edge="zero")
    zxbcdt = dense_apply(p["in_proj"], xh)
    z = zxbcdt[..., :inner]
    xbc = zxbcdt[..., inner:inner + inner + 2 * state_dim]
    dt_raw = zxbcdt[..., -heads:].astype(jnp.float32)

    xbc = depthwise_conv1d(xbc, p["conv_w"].astype(xbc.dtype),
                           p["conv_b"], padding="SAME")
    xbc = jax.nn.silu(xbc)

    def trim(a):
        return a[:, halo:a.shape[1] - halo]

    z, xbc, dt_raw = trim(z), trim(xbc), trim(dt_raw)
    u = xbc[..., :inner]
    Bm = xbc[..., inner:inner + state_dim]
    Cm = xbc[..., inner + state_dim:]

    b, L, _ = u.shape
    uh = u.reshape(b, L, heads, P)
    dt_f = jax.nn.softplus(dt_raw + p["dt_bias_f"])
    dt_b = jax.nn.softplus(dt_raw + p["dt_bias_b"])
    y = (ssd_parallel_scan(uh, dt_f, -jnp.exp(p["A_log_f"]), Bm, Cm,
                           axis_name=axis_name, chunk=chunk)
         + ssd_parallel_scan(uh, dt_b, -jnp.exp(p["A_log_b"]), Bm, Cm,
                             axis_name=axis_name, chunk=chunk, reverse=True))
    y = y.reshape(b, L, inner) + u * p["D"].astype(u.dtype)

    y = y * jax.nn.silu(z)
    yf = y.astype(jnp.float32)
    y = (yf * jax.lax.rsqrt(jnp.mean(yf * yf, axis=-1, keepdims=True) + 1e-6)
         * p["norm_scale"]).astype(x.dtype)
    return dense_apply(p["out_proj"], y)


def bissm_init(key, dim: int, state_dim: int = 4, expand: int = 2,
               conv_kernel: int = 5, dt_rank: int | None = None):
    """Bidirectional Mamba-1 with SHARED streams for short sequences (the
    per-pixel temporal axis): one in_proj / centered conv / x_proj feeds
    both directions, which differ in dt bias, A, and D. Scanned by the
    batch-major fused kernel (ops/scan.py selective_scan_bidir_shared) —
    one kernel launch, no time-major transposes, one summed output."""
    inner = dim * expand
    dt_rank = dt_rank or max(dim // 16, 1)
    ks = jax.random.split(key, 8)
    a = jnp.tile(jnp.arange(1, state_dim + 1,
                            dtype=jnp.float32)[None, :], (inner, 1))

    def dtb_init(k):
        return jnp.log(jnp.exp(jnp.exp(
            jax.random.uniform(k, (inner,), jnp.float32)
            * (math.log(0.1) - math.log(0.001)) + math.log(0.001)))
            - 1.0 + 1e-9)

    return {
        "in_proj": dense_init(ks[0], dim, 2 * inner, bias=False),
        "conv_w": jax.random.normal(ks[1], (conv_kernel, 1, inner),
                                    jnp.float32)
        * (1.0 / math.sqrt(conv_kernel)),
        "conv_b": jnp.zeros((inner,), jnp.float32),
        "x_proj": dense_init(ks[2], inner, dt_rank + 2 * state_dim,
                             bias=False),
        "dt_proj": dense_init(ks[3], dt_rank, inner),
        "dt_bias_f": dtb_init(ks[4]),
        "dt_bias_b": dtb_init(ks[5]),
        "A_log_f": jnp.log(a),
        "A_log_b": jnp.log(a),
        "D_f": jnp.ones((inner,), jnp.float32),
        "D_b": jnp.ones((inner,), jnp.float32),
        "out_proj": dense_init(ks[6], inner, dim, bias=False),
    }


def bissm_apply(p, x: jnp.ndarray, impl: str = "fused",
                interpret: bool | None = None) -> jnp.ndarray:
    """x: (B, L, dim) -> (B, L, dim). L must be small (the kernel unrolls
    it statically).

    impl="fused" (default) runs the whole interior — conv, SiLU,
    projections, bidirectional scan, gate — as ONE batch-major Pallas
    kernel (ops/scan.py fused_bidir_ssm): the conv/proj/scan intermediates
    never touch HBM. impl="composed" is the five-op XLA path it replaced,
    kept for A/B and as the numerics ground truth. ``interpret=True``
    forces the Pallas kernel in interpret mode (CPU-mesh exactness checks
    of the PRODUCTION kernel, parallel/dryrun.py)."""
    from ..ops.scan import fused_bidir_ssm, selective_scan_bidir_shared

    state_dim = p["A_log_f"].shape[1]
    dt_rank = p["x_proj"]["w"].shape[1] - 2 * state_dim

    xz = dense_apply(p["in_proj"], x)
    u, gate = jnp.split(xz, 2, axis=-1)
    if impl == "fused":
        y = fused_bidir_ssm(
            u, gate, p["conv_w"], p["conv_b"], p["x_proj"]["w"],
            p["dt_proj"]["w"], p["dt_proj"]["b"], p["dt_bias_f"],
            p["dt_bias_b"], -jnp.exp(p["A_log_f"]), -jnp.exp(p["A_log_b"]),
            p["D_f"], p["D_b"], dt_rank, interpret=interpret)
        return dense_apply(p["out_proj"], y)
    u = jax.nn.silu(depthwise_conv1d(u, p["conv_w"].astype(u.dtype),
                                     p["conv_b"], padding="SAME"))
    proj = dense_apply(p["x_proj"], u)
    dt_raw = proj[..., :dt_rank]
    Bm = proj[..., dt_rank:dt_rank + state_dim]
    Cm = proj[..., dt_rank + state_dim:]
    dtp = dense_apply(p["dt_proj"], dt_raw)
    dt_f = jax.nn.softplus(dtp + p["dt_bias_f"])
    dt_b = jax.nn.softplus(dtp + p["dt_bias_b"])

    y = selective_scan_bidir_shared(
        u, dt_f, dt_b, -jnp.exp(p["A_log_f"]), -jnp.exp(p["A_log_b"]),
        Bm, Cm, p["D_f"], p["D_b"], impl="bidir")
    y = y * jax.nn.silu(gate)
    return dense_apply(p["out_proj"], y)


def bissm_apply_sharded(p, x: jnp.ndarray,
                        axis_name: str = "time") -> jnp.ndarray:
    """EXACT bissm over a sequence sharded across ``axis_name`` (inside
    shard_map). x: local shard (B, L_loc, dim).

    The centered conv's receptive field is satisfied with a frame halo
    (zero frames at the global edges, matching the unsharded SAME padding);
    both scan directions run the distributed prefix-combine
    (temporal_parallel_scan with reverse for the backward scan)."""
    from ..parallel.temporal import halo_exchange_time, temporal_parallel_scan

    state_dim = p["A_log_f"].shape[1]
    dt_rank = p["x_proj"]["w"].shape[1] - 2 * state_dim
    k = p["conv_w"].shape[0]
    halo = max((k - 1) // 2, k // 2)
    if x.shape[1] < halo:
        raise ValueError(
            f"local T shard ({x.shape[1]}) smaller than conv halo ({halo})")

    xh = halo_exchange_time(x, halo, axis_name=axis_name, edge="zero")
    xz = dense_apply(p["in_proj"], xh)
    u, gate = jnp.split(xz, 2, axis=-1)
    # Zero halo frames produce nonzero conv/in_proj outputs only through
    # biases; the conv below re-reads the zero *inputs*, so compute the conv
    # on the extended u derived from the (zeroed-at-edges) input and trim.
    u = jax.nn.silu(depthwise_conv1d(u, p["conv_w"].astype(u.dtype),
                                     p["conv_b"], padding="SAME"))

    def trim(a):
        return a[:, halo:a.shape[1] - halo]

    u = trim(u)
    gate = trim(gate)
    proj = dense_apply(p["x_proj"], u)
    dt_raw = proj[..., :dt_rank]
    Bm = proj[..., dt_rank:dt_rank + state_dim]
    Cm = proj[..., dt_rank + state_dim:]
    dtp = dense_apply(p["dt_proj"], dt_raw)
    dt_f = jax.nn.softplus(dtp + p["dt_bias_f"])
    dt_b = jax.nn.softplus(dtp + p["dt_bias_b"])

    yf = temporal_parallel_scan(u, dt_f, -jnp.exp(p["A_log_f"]), Bm, Cm,
                                p["D_f"], axis_name=axis_name)
    yb = temporal_parallel_scan(u, dt_b, -jnp.exp(p["A_log_b"]), Bm, Cm,
                                p["D_b"], axis_name=axis_name, reverse=True)
    y = (yf + yb) * jax.nn.silu(gate)
    return dense_apply(p["out_proj"], y)


def bimamba2_init(key, dim: int, **kw):
    """Bidirectional Mamba-2: forward + reversed SSD scans, concat, fuse."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fwd": mamba2_init(k1, dim, **kw),
        "bwd": mamba2_init(k2, dim, **kw),
        "fuse": dense_init(k3, 2 * dim, dim),
    }


def bimamba2_apply(p, x: jnp.ndarray, chunk: int = 256) -> jnp.ndarray:
    yf = mamba2_apply(p["fwd"], x, chunk=chunk)
    yb = mamba2_apply(p["bwd"], x, reverse=True, chunk=chunk)
    return dense_apply(p["fuse"], jnp.concatenate([yf, yb], axis=-1))


def bimamba_apply(p, x: jnp.ndarray, impl: str | None = None) -> jnp.ndarray:
    B, L = x.shape[0], x.shape[1]
    use_fused = (
        impl in (None, "pallas_short")
        and L <= 32 and B >= 1024
        and jax.default_backend() == "tpu"
    )
    if use_fused:
        from ..ops.scan import selective_scan_bidir

        uf, gf, dtf, Bf, Cf = _ssm_streams(p["fwd"], x, reverse=False)
        ub, gb, dtb, Bb, Cb = _ssm_streams(p["bwd"], x, reverse=True)
        yf, yb = selective_scan_bidir(
            uf, dtf, -jnp.exp(p["fwd"]["A_log"]), Bf, Cf, p["fwd"]["D"],
            ub, dtb, -jnp.exp(p["bwd"]["A_log"]), Bb, Cb, p["bwd"]["D"],
        )
        yf = dense_apply(p["fwd"]["out_proj"], yf * jax.nn.silu(gf))
        yb = dense_apply(p["bwd"]["out_proj"], yb * jax.nn.silu(gb))
    else:
        yf = ssm_apply(p["fwd"], x, impl=impl)
        yb = ssm_apply(p["bwd"], x, reverse=True, impl=impl)
    return dense_apply(p["fuse"], jnp.concatenate([yf, yb], axis=-1))


def _attentive_heads(inner: int) -> int:
    """MXU-first head sizing: 64-wide heads, capped at 8, dividing inner."""
    heads = max(1, min(8, inner // 64))
    while inner % heads:
        heads -= 1
    return heads


def attentive_ssm_init(key, dim: int, expand: int = 2,
                       conv_kernel: int = 3):
    """MambaIRv2-style attentive spatial mixer (reference
    models/backbones/mamba/mambairv2_blocks.py:35-107).

    The reference's ``AttentiveSSM`` declares state-space tensors but never
    uses them (A_log/D at mambairv2_blocks.py:55-56 are dead parameters);
    its forward is in_proj -> depthwise 2D conv -> full spatial
    self-attention with a residual LayerNorm -> SiLU gating -> out_proj.
    This mixer reproduces that computation with the attention running
    through the shared flash kernel (ops/attention.py) and head sizing
    chosen MXU-first (64-wide heads) instead of the reference's
    round-to-8 embed_dim projection shim (mambairv2_blocks.py:60-69).
    """
    from .core import conv2d_init, layer_norm_init

    inner = dim * expand
    ks = jax.random.split(key, 5)
    return {
        "in_proj": dense_init(ks[0], dim, 2 * inner, bias=False),
        "conv": conv2d_init(ks[1], conv_kernel, conv_kernel, inner, inner,
                            groups=inner),
        "qkv": dense_init(ks[2], inner, 3 * inner, bias=False),
        "attn_out": dense_init(ks[3], inner, inner),
        "attn_norm": layer_norm_init(inner),
        "out_proj": dense_init(ks[4], inner, dim, bias=False),
    }


def attentive_ssm_apply(p, x: jnp.ndarray) -> jnp.ndarray:
    """``(B, H, W, C) -> (B, H, W, C)`` attentive mixing of one frame."""
    from ..ops.attention import attention
    from .core import conv2d_apply, layer_norm_apply

    b, h, w, c = x.shape
    xz = dense_apply(p["in_proj"], x)
    xs, z = jnp.split(xz, 2, axis=-1)
    inner = xs.shape[-1]
    heads = _attentive_heads(inner)
    xs = conv2d_apply(p["conv"], xs, groups=inner)

    seq = xs.reshape(b, h * w, inner)
    qkv = dense_apply(p["qkv"], seq)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    dh = inner // heads

    def to_heads(a):
        return a.reshape(b, h * w, heads, dh).transpose(0, 2, 1, 3)

    att = attention(to_heads(q), to_heads(k), to_heads(v))
    att = att.transpose(0, 2, 1, 3).reshape(b, h * w, inner)
    seq = seq + layer_norm_apply(p["attn_norm"],
                                 dense_apply(p["attn_out"], att))
    y = jax.nn.silu(seq.reshape(b, h, w, inner)) * jax.nn.silu(z)
    return dense_apply(p["out_proj"], y)
