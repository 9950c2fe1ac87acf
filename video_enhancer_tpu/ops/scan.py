"""Selective scan (diagonal SSM) — the framework's hottest kernel.

The reference computes its Mamba scan with a *sequential Python loop over the
sequence* (reference models/backbones/mamba/ea_mamba_blocks.py:120-147), which
is the single worst hot spot in its compute core. Here it is a first-class op
with three interchangeable implementations:

- ``selective_scan_ref``        lax.scan, sequential; numerics ground truth
- ``selective_scan_assoc``      jax.lax.associative_scan (log-depth, parallel)
- ``selective_scan_pallas``     fused Pallas kernel: generates decay terms,
                                runs a Hillis scan per chunk in VMEM, applies
                                the C-contraction — never materializing the
                                (B, L, D, N) state tensor in HBM
- ``selective_scan``            dispatcher (pallas on TPU, assoc elsewhere)

Recurrence (per batch b, channel d, state n):

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t
    y_t = sum_n C_t[n] * h_t[n] + D[d] * x_t

Shapes: x, dt ``(B, L, D)``; A ``(D, N)``; Bmat, C ``(B, L, N)``; D ``(D,)``.

``chunked_selective_scan`` exposes the carried state so long clips can be
processed in streaming chunks — and, across chips, the carry becomes the
payload of a temporal-axis ``ppermute`` (the Mamba analog of ring attention;
see parallel/temporal.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.flops import record as flop_record


def _scan_flops(B, L, Dd, N, streams: int = 1) -> float:
    """Analytic FLOPs of one selective-scan stream: per (b, l, d, n) the
    recurrence costs ~9 FLOPs (decay exp ~2, state mult-add 3, drive 2,
    C-contraction MAC 2) plus the D*x skip."""
    return streams * (9.0 * B * L * Dd * N + 2.0 * B * L * Dd)


__all__ = [
    "selective_scan",
    "selective_scan_ref",
    "selective_scan_assoc",
    "selective_scan_pallas",
    "selective_scan_pallas_short",
    "chunked_selective_scan",
]


def _decays(x, dt, A, Bmat):
    """deltaA:(B,L,D,N) decay, deltaBx:(B,L,D,N) drive — fp32."""
    x = x.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    A = A.astype(jnp.float32)
    Bmat = Bmat.astype(jnp.float32)
    deltaA = jnp.exp(dt[..., None] * A[None, None])  # (B,L,D,N)
    deltaBx = dt[..., None] * Bmat[:, :, None, :] * x[..., None]
    return deltaA, deltaBx


def selective_scan_ref(x, dt, A, Bmat, C, D, h0=None):
    """Sequential lax.scan ground truth. Returns (y, h_last).

    Memory-lean: decay/drive terms are generated *per step inside the scan
    body* — materializing the full (B, L, D, N) tensors costs gigabytes of
    HBM traffic when the batch is per-pixel (B = B*H*W in the video models).
    """
    B, L, Dd = x.shape
    N = A.shape[1]
    Af = A.astype(jnp.float32)

    if h0 is None:
        # Derive the zeros from x so the carry's device-variance typing
        # matches the scanned inputs under shard_map (zero cost after
        # fusion; a plain jnp.zeros is "unvarying" and lax.scan rejects it).
        h0 = jnp.zeros((B, Dd, N), jnp.float32) \
            + (x[:, 0, :, None] * 0).astype(jnp.float32)

    def step(h, inputs):
        x_t, dt_t, b_t, c_t = inputs  # (B,D),(B,D),(B,N),(B,N)
        dtf = dt_t.astype(jnp.float32)
        dA = jnp.exp(dtf[..., None] * Af[None])              # (B,D,N)
        dBx = dtf[..., None] * b_t.astype(jnp.float32)[:, None, :] \
            * x_t.astype(jnp.float32)[..., None]
        h = dA * h + dBx
        y = jnp.einsum("bdn,bn->bd", h, c_t.astype(jnp.float32))
        return h, y

    xs = (
        jnp.moveaxis(x, 1, 0),
        jnp.moveaxis(dt, 1, 0),
        jnp.moveaxis(Bmat, 1, 0),
        jnp.moveaxis(C, 1, 0),
    )
    h_last, ys = jax.lax.scan(step, h0, xs)
    y = jnp.moveaxis(ys, 0, 1) + x.astype(jnp.float32) * D.astype(jnp.float32)
    return y.astype(x.dtype), h_last


def selective_scan_assoc(x, dt, A, Bmat, C, D, h0=None):
    """Parallel scan via jax.lax.associative_scan on (a, b) pairs."""
    B, L, Dd = x.shape
    N = A.shape[1]
    deltaA, deltaBx = _decays(x, dt, A, Bmat)

    def combine(l, r):
        a_l, b_l = l
        a_r, b_r = r
        return a_r * a_l, a_r * b_l + b_r

    a_s, b_s = jax.lax.associative_scan(combine, (deltaA, deltaBx), axis=1)
    if h0 is not None:
        h = b_s + a_s * h0[:, None]
    else:
        h = b_s
    y = jnp.einsum("bldn,bln->bld", h, C.astype(jnp.float32))
    y = y + x.astype(jnp.float32) * D.astype(jnp.float32)
    h_last = h[:, -1]
    return y.astype(x.dtype), h_last


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _scan_kernel(x_ref, dt_ref, A_ref, B_ref, C_ref, D_ref, h0_ref,
                 y_ref, hlast_ref, state, *, N, CHUNK, n_l):
    """One (batch, d-block, l-chunk) program; the l-chunk grid dimension is
    sequential ("arbitrary") and carries the SSM state in VMEM scratch.

    Block layouts:
      x_ref, dt_ref, y_ref: (1, CHUNK, DB)    A_ref: (N, DB)
      B_ref, C_ref: (1, CHUNK, N)             D_ref: (1, DB)
      h0_ref, hlast_ref: (1, N, DB)           state (scratch): (N, DB)
    """
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _init():
        state[:, :] = h0_ref[0, :, :]

    xc = x_ref[0].astype(jnp.float32)        # (C, DB)
    dtc = dt_ref[0].astype(jnp.float32)      # (C, DB)
    Bc = B_ref[0].astype(jnp.float32)        # (C, N)
    Cc = C_ref[0].astype(jnp.float32)        # (C, N)
    Af = A_ref[:, :].astype(jnp.float32)     # (N, DB)

    # (C, N, DB) decay and drive, generated in VMEM (never hit HBM).
    a = jnp.exp(dtc[:, None, :] * Af[None])
    b = dtc[:, None, :] * Bc[:, :, None] * xc[:, None, :]

    # Hillis inclusive scan along the chunk axis.
    pos = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1, 1), 0)
    shift = 1
    while shift < CHUNK:
        a_sh = pltpu.roll(a, shift, 0)
        b_sh = pltpu.roll(b, shift, 0)
        valid = pos >= shift
        a_prev = jnp.where(valid, a_sh, 1.0)
        b_prev = jnp.where(valid, b_sh, 0.0)
        b = a * b_prev + b
        a = a * a_prev
        shift *= 2

    # Fold in the carry from previous chunks.
    h = b + a * state[:, :][None]            # (C, N, DB)
    y = jnp.sum(h * Cc[:, :, None], axis=1)  # (C, DB)
    y = y + xc * D_ref[0, :].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)
    state[:, :] = h[CHUNK - 1]

    @pl.when(li == n_l - 1)
    def _final():
        hlast_ref[0, :, :] = state[:, :]


# ---------------------------------------------------------------------------
# Short-L / huge-B kernel (the video models' temporal scans: L = 8-16 frames,
# B = B*H*W per-pixel sequences). The state (BB, N, D) lives in VMEM across
# every step, so HBM sees only x/dt/B/C reads and y writes — the lax.scan
# form re-reads and re-writes the full (B, D, N) state L times.
# ---------------------------------------------------------------------------


def _scan_short_kernel(x_ref, dt_ref, A_ref, B_ref, C_ref, D_ref, h0_ref,
                       y_ref, hlast_ref, *, L, N):
    """One B-block program; time-major layout so the per-step dynamic index
    lands on the (untiled) leading dimension. Block layouts:
    x_ref, dt_ref, y_ref: (L, BB, D)  B_ref, C_ref: (L, BB, N)
    A_ref: (N, D)  D_ref: (1, D)  h0_ref, hlast_ref: (BB, N, D)
    """
    Af = A_ref[:, :].astype(jnp.float32)          # (N, D)
    Dv = D_ref[0, :].astype(jnp.float32)          # (D,)

    def step(l, h):
        x_t = x_ref[l].astype(jnp.float32)            # (BB, D)
        dt_t = dt_ref[l].astype(jnp.float32)          # (BB, D)
        b_t = B_ref[l].astype(jnp.float32)            # (BB, N)
        c_t = C_ref[l].astype(jnp.float32)            # (BB, N)
        a = jnp.exp(dt_t[:, None, :] * Af[None])      # (BB, N, D)
        h = a * h + (dt_t * x_t)[:, None, :] * b_t[..., None]
        y = jnp.sum(h * c_t[..., None], axis=1) + x_t * Dv
        y_ref[l] = y.astype(y_ref.dtype)
        return h

    h = jax.lax.fori_loop(0, L, step, h0_ref[:, :, :].astype(jnp.float32))
    hlast_ref[:, :, :] = h


@functools.partial(jax.jit, static_argnames=("interpret",))
def _selective_scan_pallas_short_impl(x, dt, A, Bmat, C, D, h0,
                                      interpret=False):
    B, L, Dd = x.shape
    N = A.shape[1]
    BB = 256
    pad_b = (-B) % BB
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, pad_b), (0, 0), (0, 0)))
        Bmat = jnp.pad(Bmat, ((0, pad_b), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, pad_b), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad_b), (0, 0), (0, 0)))
    Bp = B + pad_b
    n_b = Bp // BB

    kernel = functools.partial(_scan_short_kernel, L=L, N=N)
    # Time-major for the kernel (dynamic step index on the leading dim).
    xt = x.swapaxes(0, 1)          # (L, Bp, D)
    dtt = dt.swapaxes(0, 1)
    Bt = Bmat.swapaxes(0, 1)       # (L, Bp, N)
    Ct = C.swapaxes(0, 1)
    y, hlast = pl.pallas_call(
        kernel,
        grid=(n_b,),
        in_specs=[
            pl.BlockSpec((L, BB, Dd), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BB, Dd), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Dd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BB, N), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BB, N), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, N, Dd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, BB, Dd), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, N, Dd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Bp, Dd), x.dtype),
            jax.ShapeDtypeStruct((Bp, N, Dd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xt, dtt, A.swapaxes(0, 1), Bt, Ct, D[None, :], h0.swapaxes(1, 2))
    return y.swapaxes(0, 1)[:B], hlast.swapaxes(1, 2)[:B]


@jax.custom_vjp
def _short_nostate_diffable(x, dt, A, Bmat, C, D):
    """Differentiable wrapper: Pallas forward, reference-impl backward
    (the kernels define no VJP; recomputing the scan through the
    streaming lax.scan form in the backward pass is exact)."""
    interpret = jax.default_backend() != "tpu"
    return _selective_scan_pallas_short_nostate_impl(
        x, dt, A, Bmat, C, D, interpret=interpret)


def _short_nostate_fwd(x, dt, A, Bmat, C, D):
    return _short_nostate_diffable(x, dt, A, Bmat, C, D), \
        (x, dt, A, Bmat, C, D)


def _short_nostate_bwd(res, gy):
    _, vjp = jax.vjp(lambda *a: selective_scan_ref(*a)[0], *res)
    return vjp(gy)


_short_nostate_diffable.defvjp(_short_nostate_fwd, _short_nostate_bwd)


def selective_scan_pallas_short(x, dt, A, Bmat, C, D, h0=None,
                                interpret=None, need_state: bool = True):
    """Batched short-sequence scan. Returns (y, h_last).

    With ``h0=None`` and ``need_state=False`` the stateless kernel runs
    (state never leaves VMEM) and ``h_last`` comes back as None.
    """
    B, L, Dd = x.shape
    N = A.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    flop_record(_scan_flops(B, L, Dd, N))
    if h0 is None and not need_state:
        return _short_nostate_diffable(x, dt, A, Bmat, C, D), None
    if h0 is None:
        h0 = jnp.zeros((B, Dd, N), jnp.float32)
    return _selective_scan_pallas_short_impl(x, dt, A, Bmat, C, D, h0,
                                             interpret=interpret)


def _scan_short_kernel_nostate(x_ref, dt_ref, A_ref, B_ref, C_ref, D_ref,
                               y_ref, state, *, L, N):
    """Stateless variant: zero initial state, final state discarded — the
    (B, N, D) fp32 state tensors never touch HBM (they were half the
    kernel's traffic). Layouts as in _scan_short_kernel; ``state`` is VMEM
    scratch (BB, N, D) fp32."""
    Af = A_ref[:, :].astype(jnp.float32)
    Dv = D_ref[0, :].astype(jnp.float32)
    state[:, :, :] = jnp.zeros_like(state)

    def step(l, _):
        x_t = x_ref[l].astype(jnp.float32)
        dt_t = dt_ref[l].astype(jnp.float32)
        b_t = B_ref[l].astype(jnp.float32)
        c_t = C_ref[l].astype(jnp.float32)
        a = jnp.exp(dt_t[:, None, :] * Af[None])
        h = a * state[:, :, :] + (dt_t * x_t)[:, None, :] * b_t[..., None]
        state[:, :, :] = h
        y_ref[l] = (jnp.sum(h * c_t[..., None], axis=1)
                    + x_t * Dv).astype(y_ref.dtype)
        return ()

    jax.lax.fori_loop(0, L, step, ())


@functools.partial(jax.jit, static_argnames=("interpret",))
def _selective_scan_pallas_short_nostate_impl(x, dt, A, Bmat, C, D,
                                              interpret=False):
    B, L, Dd = x.shape
    N = A.shape[1]
    BB = 256
    pad_b = (-B) % BB
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, pad_b), (0, 0), (0, 0)))
        Bmat = jnp.pad(Bmat, ((0, pad_b), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, pad_b), (0, 0), (0, 0)))
    Bp = B + pad_b
    n_b = Bp // BB

    kernel = functools.partial(_scan_short_kernel_nostate, L=L, N=N)
    y = pl.pallas_call(
        kernel,
        grid=(n_b,),
        in_specs=[
            pl.BlockSpec((L, BB, Dd), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BB, Dd), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Dd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BB, N), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BB, N), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, BB, Dd), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, Bp, Dd), x.dtype),
        scratch_shapes=[pltpu.VMEM((BB, N, Dd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x.swapaxes(0, 1), dt.swapaxes(0, 1), A.swapaxes(0, 1),
      Bmat.swapaxes(0, 1), C.swapaxes(0, 1), D[None, :])
    return y.swapaxes(0, 1)[:B]


def _scan_bidir_kernel(xf_ref, dtf_ref, Af_ref, Bf_ref, Cf_ref, Df_ref,
                       xb_ref, dtb_ref, Ab_ref, Bb_ref, Cb_ref, Db_ref,
                       yf_ref, yb_ref, state_f, state_b, *, L, N):
    """Fused bidirectional stateless scan: forward stream scans l ascending
    while the backward stream scans L-1-l descending in the same loop —
    one kernel launch, no host-side flips. Layouts as in
    _scan_short_kernel_nostate (time-major)."""
    Aff = Af_ref[:, :].astype(jnp.float32)
    Abf = Ab_ref[:, :].astype(jnp.float32)
    Dfv = Df_ref[0, :].astype(jnp.float32)
    Dbv = Db_ref[0, :].astype(jnp.float32)
    state_f[:, :, :] = jnp.zeros_like(state_f)
    state_b[:, :, :] = jnp.zeros_like(state_b)

    def step(l, _):
        lb = L - 1 - l
        # forward direction
        x_t = xf_ref[l].astype(jnp.float32)
        dt_t = dtf_ref[l].astype(jnp.float32)
        b_t = Bf_ref[l].astype(jnp.float32)
        c_t = Cf_ref[l].astype(jnp.float32)
        a = jnp.exp(dt_t[:, None, :] * Aff[None])
        hf = a * state_f[:, :, :] + (dt_t * x_t)[:, None, :] * b_t[..., None]
        state_f[:, :, :] = hf
        yf_ref[l] = (jnp.sum(hf * c_t[..., None], axis=1)
                     + x_t * Dfv).astype(yf_ref.dtype)
        # backward direction
        x_t = xb_ref[lb].astype(jnp.float32)
        dt_t = dtb_ref[lb].astype(jnp.float32)
        b_t = Bb_ref[lb].astype(jnp.float32)
        c_t = Cb_ref[lb].astype(jnp.float32)
        a = jnp.exp(dt_t[:, None, :] * Abf[None])
        hb = a * state_b[:, :, :] + (dt_t * x_t)[:, None, :] * b_t[..., None]
        state_b[:, :, :] = hb
        yb_ref[lb] = (jnp.sum(hb * c_t[..., None], axis=1)
                      + x_t * Dbv).astype(yb_ref.dtype)
        return ()

    jax.lax.fori_loop(0, L, step, ())


@functools.partial(jax.jit, static_argnames=("interpret",))
def _selective_scan_bidir_impl(xf, dtf, Af, Bf, Cf, Df,
                               xb, dtb, Ab, Bb, Cb, Db, interpret=False):
    B, L, Dd = xf.shape
    N = Af.shape[1]
    BB = 256
    pad_b = (-B) % BB

    def padb(a):
        return jnp.pad(a, ((0, pad_b), (0, 0), (0, 0))) if pad_b else a

    xf, dtf, Bf, Cf = map(padb, (xf, dtf, Bf, Cf))
    xb, dtb, Bb, Cb = map(padb, (xb, dtb, Bb, Cb))
    Bp = B + pad_b
    n_b = Bp // BB

    def tm(a):  # time-major
        return a.swapaxes(0, 1)

    seq_spec = pl.BlockSpec((L, BB, Dd), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((L, BB, N), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((N, Dd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, Dd), lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_scan_bidir_kernel, L=L, N=N)
    yf, yb = pl.pallas_call(
        kernel,
        grid=(n_b,),
        in_specs=[seq_spec, seq_spec, aspec, nspec, nspec, dspec,
                  seq_spec, seq_spec, aspec, nspec, nspec, dspec],
        out_specs=[seq_spec, seq_spec],
        out_shape=[jax.ShapeDtypeStruct((L, Bp, Dd), xf.dtype),
                   jax.ShapeDtypeStruct((L, Bp, Dd), xb.dtype)],
        scratch_shapes=[pltpu.VMEM((BB, N, Dd), jnp.float32),
                        pltpu.VMEM((BB, N, Dd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(tm(xf), tm(dtf), Af.swapaxes(0, 1), tm(Bf), tm(Cf), Df[None, :],
      tm(xb), tm(dtb), Ab.swapaxes(0, 1), tm(Bb), tm(Cb), Db[None, :])
    return tm(yf)[:B], tm(yb)[:B]


@jax.custom_vjp
def _bidir_diffable(xf, dtf, Af, Bf, Cf, Df, xb, dtb, Ab, Bb, Cb, Db):
    interpret = jax.default_backend() != "tpu"
    return _selective_scan_bidir_impl(xf, dtf, Af, Bf, Cf, Df,
                                      xb, dtb, Ab, Bb, Cb, Db,
                                      interpret=interpret)


def _bidir_ref(xf, dtf, Af, Bf, Cf, Df, xb, dtb, Ab, Bb, Cb, Db):
    yf, _ = selective_scan_ref(xf, dtf, Af, Bf, Cf, Df)
    flip = lambda a: jnp.flip(a, axis=1)
    yb, _ = selective_scan_ref(flip(xb), flip(dtb), Ab, flip(Bb), flip(Cb),
                               Db)
    return yf, flip(yb)


def _bidir_fwd(*args):
    return _bidir_diffable(*args), args


def _bidir_bwd(res, gy):
    _, vjp = jax.vjp(_bidir_ref, *res)
    return vjp(gy)


_bidir_diffable.defvjp(_bidir_fwd, _bidir_bwd)


def selective_scan_bidir(xf, dtf, Af, Bf, Cf, Df,
                         xb, dtb, Ab, Bb, Cb, Db, interpret=None):
    """Fused forward + time-reversed scans over the same sequence axis.

    The forward stream is scanned l = 0..L-1; the backward stream is scanned
    l = L-1..0 (equivalent to flip -> scan -> flip, without the flips).
    Returns (y_forward, y_backward), both in natural order. Differentiable
    (reference-impl backward).
    """
    flop_record(_scan_flops(xf.shape[0], xf.shape[1], xf.shape[2],
                            Af.shape[1], streams=2))
    if interpret is not None and interpret:
        return _selective_scan_bidir_impl(xf, dtf, Af, Bf, Cf, Df,
                                          xb, dtb, Ab, Bb, Cb, Db,
                                          interpret=True)
    return _bidir_diffable(xf, dtf, Af, Bf, Cf, Df, xb, dtb, Ab, Bb, Cb, Db)


def _pick_chunk(L: int) -> int:
    c = 1
    while c * 2 <= min(L, 256):
        c *= 2
    return c


@functools.partial(jax.jit, static_argnames=("interpret",))
def _selective_scan_pallas_impl(x, dt, A, Bmat, C, D, h0, interpret=False):
    B, L, Dd = x.shape
    N = A.shape[1]
    DB = min(Dd, 512)  # channel block
    CHUNK = _pick_chunk(L)
    pad = (-L) % CHUNK
    pad_d = (-Dd) % DB
    if pad:
        # Pad with dt=0 -> decay=1, drive=0: state passes through unchanged.
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bmat = jnp.pad(Bmat, ((0, 0), (0, pad), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
    if pad_d:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_d)))
        dt = jnp.pad(dt, ((0, 0), (0, 0), (0, pad_d)))
        A = jnp.pad(A, ((0, pad_d), (0, 0)))
        D = jnp.pad(D, ((0, pad_d),))
        h0 = jnp.pad(h0, ((0, 0), (0, pad_d), (0, 0)))
    Lp, Dp = L + pad, Dd + pad_d
    n_l, n_d = Lp // CHUNK, Dp // DB

    kernel = functools.partial(_scan_kernel, N=N, CHUNK=CHUNK, n_l=n_l)
    y, hlast = pl.pallas_call(
        kernel,
        grid=(B, n_d, n_l),
        in_specs=[
            pl.BlockSpec((1, CHUNK, DB), lambda b, d, l: (b, l, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, DB), lambda b, d, l: (b, l, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, DB), lambda b, d, l: (0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, N), lambda b, d, l: (b, l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, N), lambda b, d, l: (b, l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DB), lambda b, d, l: (0, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, DB), lambda b, d, l: (b, 0, d),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CHUNK, DB), lambda b, d, l: (b, l, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, DB), lambda b, d, l: (b, 0, d),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lp, Dp), x.dtype),
            jax.ShapeDtypeStruct((B, N, Dp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, DB), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x, dt, A.swapaxes(0, 1), Bmat, C, D[None, :], h0.swapaxes(1, 2)
    )
    return y[:, :L, :Dd], hlast.swapaxes(1, 2)[:, :Dd]


def selective_scan_pallas(x, dt, A, Bmat, C, D, h0=None, interpret=None):
    """Fused Pallas selective scan. Returns (y, h_last)."""
    B, L, Dd = x.shape
    N = A.shape[1]
    if h0 is None:
        h0 = jnp.zeros((B, Dd, N), jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    flop_record(_scan_flops(B, L, Dd, N))
    return _selective_scan_pallas_impl(x, dt, A, Bmat, C, D, h0, interpret=interpret)


def selective_scan(x, dt, A, Bmat, C, D, h0=None, impl: str | None = None,
                   need_state: bool = True):
    """Dispatching entry point. impl: ref | assoc | pallas | None(auto).

    ``need_state=False`` lets the short-scan kernel skip materializing the
    (B, D, N) state in HBM (h_last comes back as None).
    """
    if impl is None:
        B, L = x.shape[0], x.shape[1]
        on_tpu = jax.default_backend() == "tpu"
        if L <= 32:
            # Short sequences (the temporal axis of a video chunk). On TPU
            # with a big batch, the short-scan kernel keeps state in VMEM;
            # otherwise a lax.scan of L big VPU steps is fine.
            impl = "pallas_short" if (on_tpu and B >= 1024) else "ref"
        else:
            impl = "pallas" if on_tpu else "assoc"
    if impl == "pallas_short":
        return selective_scan_pallas_short(x, dt, A, Bmat, C, D, h0,
                                           need_state=need_state)
    fn = {
        "ref": selective_scan_ref,
        "assoc": selective_scan_assoc,
        "pallas": selective_scan_pallas,
    }[impl]
    return fn(x, dt, A, Bmat, C, D, h0)


def chunked_selective_scan(x, dt, A, Bmat, C, D, chunk: int, impl: str | None = None):
    """Process a long sequence in chunks, threading the carried state.

    Functionally identical to one full scan; exists so callers (and the
    temporal-parallel path) can bound per-step memory. Mirrors the reference's
    chunked processing with overlap (reference fast_mamba_vsr_handler.py:610-644)
    but with *exact* state carry instead of overlap-and-blend approximation.
    """
    B, L, Dd = x.shape
    h = jnp.zeros((B, Dd, N := A.shape[1]), jnp.float32)
    ys = []
    for s in range(0, L, chunk):
        e = min(s + chunk, L)
        y, h = selective_scan(
            x[:, s:e], dt[:, s:e], A, Bmat[:, s:e], C[:, s:e], D, h0=h, impl=impl
        )
        ys.append(y)
    return jnp.concatenate(ys, axis=1), h


# ---------------------------------------------------------------------------
# Shared-stream bidirectional short-scan kernel (temporal mixing in the video
# models: L = a handful of frames, B = B*H*W per-pixel sequences). Unlike
# selective_scan_bidir this kernel is BATCH-major — blocks are (BB, L, D)
# slabs of the natural layout, so XLA inserts no time-major transposes — and
# the two directions share u/B/C streams (only dt differs), summing their
# outputs in-kernel into ONE result tensor.
# ---------------------------------------------------------------------------


def _scan_bidir_shared_kernel(u_ref, dtf_ref, dtb_ref, Af_ref, Ab_ref,
                              B_ref, C_ref, Df_ref, Db_ref, y_ref,
                              acc_scr, *, L, N):
    """Block layouts: u_ref, dtf_ref, dtb_ref, y_ref (BB, L, D);
    B_ref, C_ref (BB, L, N); Af/Ab (N, D); Df/Db (1, D); acc_scr
    (BB, L, D) fp32 scratch holding the forward pass's output so the two
    directions sum with a single final cast.
    The L loops are static Python unrolls (L is tiny)."""
    Aff = Af_ref[:, :].astype(jnp.float32)
    Abf = Ab_ref[:, :].astype(jnp.float32)
    Dfv = Df_ref[0, :].astype(jnp.float32)
    Dbv = Db_ref[0, :].astype(jnp.float32)

    BB = u_ref.shape[0]
    D = u_ref.shape[2]

    # TWO PASSES with a register-carried state and per-step writes (round
    # 3): the forward pass writes y into an fp32 scratch, the backward
    # pass adds into it and casts once. The previous single fused loop
    # kept BOTH direction states plus 2L per-step outputs live across the
    # whole unroll — the resulting stack pressure made the kernel ~40%
    # slower (5.5 -> 3.9 ms at the FMV shape) and pinned BB at 64.
    h = jnp.zeros((BB, N, D), jnp.float32)
    for l in range(L):
        x_t = u_ref[:, l, :].astype(jnp.float32)
        dt_t = dtf_ref[:, l, :].astype(jnp.float32)
        b_t = B_ref[:, l, :].astype(jnp.float32)
        c_t = C_ref[:, l, :].astype(jnp.float32)
        a = jnp.exp(dt_t[:, None, :] * Aff[None])
        h = a * h + (dt_t * x_t)[:, None, :] * b_t[..., None]
        acc_scr[:, l, :] = jnp.sum(h * c_t[..., None], axis=1) + x_t * Dfv

    h = jnp.zeros((BB, N, D), jnp.float32)
    for l in range(L - 1, -1, -1):
        x_t = u_ref[:, l, :].astype(jnp.float32)
        dt_t = dtb_ref[:, l, :].astype(jnp.float32)
        b_t = B_ref[:, l, :].astype(jnp.float32)
        c_t = C_ref[:, l, :].astype(jnp.float32)
        a = jnp.exp(dt_t[:, None, :] * Abf[None])
        h = a * h + (dt_t * x_t)[:, None, :] * b_t[..., None]
        y_ref[:, l, :] = (acc_scr[:, l, :]
                          + jnp.sum(h * c_t[..., None], axis=1)
                          + x_t * Dbv).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scan_bidir_shared_impl(u, dtf, dtb, Af, Ab, Bm, Cm, Df, Db,
                            interpret=False):
    B, L, Dd = u.shape
    N = Af.shape[1]
    # Small batch block: the statically-unrolled L loop keeps each step's
    # decay/state intermediates live on the scoped-VMEM stack.
    BB = 64
    pad_b = (-B) % BB

    def padb(a):
        return jnp.pad(a, ((0, pad_b), (0, 0), (0, 0))) if pad_b else a

    u, dtf, dtb, Bm, Cm = map(padb, (u, dtf, dtb, Bm, Cm))
    Bp = B + pad_b
    n_b = Bp // BB

    seq_spec = pl.BlockSpec((BB, L, Dd), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    nspec = pl.BlockSpec((BB, L, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((N, Dd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, Dd), lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_scan_bidir_shared_kernel, L=L, N=N)
    y = pl.pallas_call(
        kernel,
        grid=(n_b,),
        in_specs=[seq_spec, seq_spec, seq_spec, aspec, aspec,
                  nspec, nspec, dspec, dspec],
        out_specs=seq_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, L, Dd), u.dtype),
        scratch_shapes=[pltpu.VMEM((BB, L, Dd), jnp.float32)],
        # Batch-block grids are embarrassingly parallel; the annotation
        # lets Mosaic pipeline programs. BB=64 measured best (128/256 are
        # ~25% slower — vreg pressure from the unrolled L loop).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(u, dtf, dtb, Af.swapaxes(0, 1), Ab.swapaxes(0, 1), Bm, Cm,
      Df[None, :], Db[None, :])
    return y[:B]


def _bidir_shared_ref(u, dtf, dtb, Af, Ab, Bm, Cm, Df, Db):
    yf, _ = selective_scan_ref(u, dtf, Af, Bm, Cm, Df)
    flip = lambda a: jnp.flip(a, axis=1)
    yb, _ = selective_scan_ref(flip(u), flip(dtb), Ab, flip(Bm), flip(Cm),
                               Db)
    return yf + flip(yb)


@jax.custom_vjp
def _bidir_shared_diffable(u, dtf, dtb, Af, Ab, Bm, Cm, Df, Db):
    if jax.default_backend() != "tpu":
        # lax.scan reference, NOT interpret-mode Pallas: on the 8-device
        # CPU test mesh an interpreted whole-batch kernel inside a pjit
        # program runs minutes per device and trips XLA's collective
        # stuck-check (AllGather abort). Interpret mode stays reachable
        # for kernel unit tests via selective_scan_bidir_shared(
        # interpret=True).
        return _bidir_shared_ref(u, dtf, dtb, Af, Ab, Bm, Cm, Df, Db)
    return _scan_bidir_shared_impl(u, dtf, dtb, Af, Ab, Bm, Cm, Df, Db,
                                   interpret=False)


def _bidir_shared_fwd(*args):
    return _bidir_shared_diffable(*args), args


def _bidir_shared_bwd(res, gy):
    _, vjp = jax.vjp(_bidir_shared_ref, *res)
    return vjp(gy)


_bidir_shared_diffable.defvjp(_bidir_shared_fwd, _bidir_shared_bwd)


def selective_scan_bidir_shared(u, dtf, dtb, Af, Ab, Bm, Cm, Df, Db,
                                interpret=None, impl: str = "bidir"):
    """Sum of a forward and a time-reversed selective scan over SHARED
    u/B/C streams (directions differ only in dt/A/D). Returns y = yf + yb
    in natural order. Differentiable (reference-impl backward).

    impl="bidir" (default) routes through the time-major fused kernel;
    "bmajor" is the batch-major two-pass kernel (natural (B, L, D)
    blocks, register-carried state, per-step writes through an fp32
    scratch). Standalone the bmajor kernel measures faster (3.96 vs
    5.53 ms at the FMV shape, B=57600 L=8 D=96 N=8 — the time-major
    kernel round-trips state through VMEM scratch every fori_loop step
    and pays 6 input transposes), and at the bissm_apply level the two
    tie (8.2 ms both). But at FULL-MODEL scale bidir wins decisively for
    VSRM (124.0 vs 144.7 ms) and within-noise for FMV: XLA fuses the
    time-major transposes into the surrounding projection/layout ops,
    while bmajor's natural layout forces new relayouts in context.
    Kernel-level wins must be re-measured in situ before shipping."""
    if impl == "bidir":
        yf, yb = selective_scan_bidir(u, dtf, Af, Bm, Cm, Df,
                                      u, dtb, Ab, Bm, Cm, Db,
                                      interpret=interpret)
        return yf + yb
    flop_record(_scan_flops(u.shape[0], u.shape[1], u.shape[2],
                            Af.shape[1], streams=2))
    if interpret is not None and interpret:
        return _scan_bidir_shared_impl(u, dtf, dtb, Af, Ab, Bm, Cm, Df, Db,
                                       interpret=True)
    return _bidir_shared_diffable(u, dtf, dtb, Af, Ab, Bm, Cm, Df, Db)


# ---------------------------------------------------------------------------
# Fully-fused bidirectional SSM mixer (the whole bissm interior in ONE
# kernel). The composed path runs depthwise-conv -> silu -> x_proj ->
# dt_proj -> bidirectional scan -> gate as five XLA ops, materializing the
# (B*H*W, L, D) token stream in HBM between each; at FMV scale those
# intermediates cost ~2x the roofline of the math. Here one batch-major
# kernel reads the pre-conv stream once, keeps every intermediate in
# VMEM/registers (the L axis is a handful of frames, statically unrolled),
# and writes the gated output once. The reference runs this interior as
# discrete torch modules with a Python loop over L (reference
# models/backbones/mamba/ea_mamba_blocks.py:54-147).
# ---------------------------------------------------------------------------


def _fused_bissm_kernel(u_ref, g_ref, cw_ref, cb_ref, wx_ref, wdt_ref,
                        bdt_ref, dtbf_ref, dtbb_ref, Af_ref, Ab_ref,
                        Df_ref, Db_ref, y_ref,
                        u_scr, dtb_scr, b_scr, c_scr, acc_scr,
                        *, L, N, K, dt_rank):
    """TIME-MAJOR blocks, matching _scan_bidir_kernel: u_ref/g_ref/y_ref
    (L, BB, D) — the surrounding in/out projections already feed the
    incumbent scan kernel through fused (L, B, D) transposes, and a
    batch-major variant of this kernel measured ~30 ms of relayouts at
    FMV scale. cw (K, D); wx (D, R); wdt (dt_rank, D); per-channel
    vectors (1, D); Af/Ab (N, D). Scratch: u_scr/dtb_scr/acc_scr
    (L, BB, D) f32; b_scr/c_scr (L, BB, N).

    Forward pass computes conv+silu+projections per step, stashes what the
    backward direction re-needs, and accumulates the forward scan output;
    the backward pass re-reads the stashes, adds its scan output, applies
    the gate, and casts once."""
    lo = (K - 1) // 2
    cwf = cw_ref[:, :].astype(jnp.float32)
    wxf = wx_ref[:, :].astype(jnp.float32)
    wdtf = wdt_ref[:, :].astype(jnp.float32)
    bdt = bdt_ref[0, :].astype(jnp.float32)
    dtbf = dtbf_ref[0, :].astype(jnp.float32)
    dtbb = dtbb_ref[0, :].astype(jnp.float32)
    Aff = Af_ref[:, :].astype(jnp.float32)
    Abf = Ab_ref[:, :].astype(jnp.float32)
    Dfv = Df_ref[0, :].astype(jnp.float32)
    Dbv = Db_ref[0, :].astype(jnp.float32)

    BB = u_ref.shape[1]

    h = jnp.zeros((BB, N, u_ref.shape[2]), jnp.float32)
    for l in range(L):
        conv = cb_ref[0, :].astype(jnp.float32) * jnp.ones((BB, 1),
                                                           jnp.float32)
        for j in range(K):
            t = l + j - lo
            if 0 <= t < L:
                conv = conv + u_ref[t].astype(jnp.float32) * cwf[j]
        x_t = jax.nn.silu(conv)
        u_scr[l] = x_t

        proj = jax.lax.dot_general(
            x_t, wxf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        b_t = proj[:, dt_rank:dt_rank + N]
        c_t = proj[:, dt_rank + N:dt_rank + 2 * N]
        b_scr[l] = b_t
        c_scr[l] = c_t
        dtp = bdt * jnp.ones((BB, 1), jnp.float32)
        for r in range(dt_rank):
            dtp = dtp + proj[:, r:r + 1] * wdtf[r]
        dt_t = jax.nn.softplus(dtp + dtbf)
        dtb_scr[l] = jax.nn.softplus(dtp + dtbb)

        a = jnp.exp(dt_t[:, None, :] * Aff[None])
        h = a * h + (dt_t * x_t)[:, None, :] * b_t[..., None]
        acc_scr[l] = jnp.sum(h * c_t[..., None], axis=1) + x_t * Dfv

    h = jnp.zeros((BB, N, u_ref.shape[2]), jnp.float32)
    for l in range(L - 1, -1, -1):
        x_t = u_scr[l]
        dt_t = dtb_scr[l]
        a = jnp.exp(dt_t[:, None, :] * Abf[None])
        h = a * h + (dt_t * x_t)[:, None, :] * b_scr[l][..., None]
        y = (acc_scr[l] + jnp.sum(h * c_scr[l][..., None], axis=1)
             + x_t * Dbv)
        gate = g_ref[l].astype(jnp.float32)
        y_ref[l] = (y * jax.nn.silu(gate)).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dt_rank", "interpret"))
def _fused_bissm_impl(u_pre, gate, cw, cb, wx, wdt, bdt, dtbf, dtbb,
                      Af, Ab, Df, Db, dt_rank, interpret=False):
    B, L, Dd = u_pre.shape
    N = Af.shape[1]
    K = cw.shape[0]
    # The scoped-VMEM stack scales ~ BB*L: the twice-unrolled L loop keeps
    # h/decay intermediates live across the unroll, and the TPU stack limit
    # is 16M. Measured at Dd=96: BB*L=2048 needs ~17.5M (BB=256,L=8 ->
    # 17.4M; BB=128,L=16 -> 17.86M, caught live as a silent bicubic
    # fallback in the e2e pipeline at chunk=16); BB*L=1024 fits. Keep
    # BB=128 for L<=8 (the benched config) and shrink BB for longer
    # chunks so every chunk length compiles.
    BB = min(128, max(8, (1024 // max(L, 1)) // 8 * 8))
    pad_b = (-B) % BB

    def padb(a):
        return jnp.pad(a, ((0, pad_b), (0, 0), (0, 0))) if pad_b else a

    u_pre, gate = padb(u_pre), padb(gate)
    n_b = (B + pad_b) // BB

    def tm(a):  # time-major, fused into the neighboring projections
        return a.swapaxes(0, 1)

    seq = pl.BlockSpec((L, BB, Dd), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)

    def fixed(r, c):
        return pl.BlockSpec((r, c), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    R = dt_rank + 2 * N
    kernel = functools.partial(_fused_bissm_kernel, L=L, N=N, K=K,
                               dt_rank=dt_rank)
    y = pl.pallas_call(
        kernel,
        grid=(n_b,),
        in_specs=[seq, seq, fixed(K, Dd), fixed(1, Dd), fixed(Dd, R),
                  fixed(dt_rank, Dd), fixed(1, Dd), fixed(1, Dd),
                  fixed(1, Dd), fixed(N, Dd), fixed(N, Dd), fixed(1, Dd),
                  fixed(1, Dd)],
        out_specs=seq,
        out_shape=jax.ShapeDtypeStruct((L, B + pad_b, Dd), u_pre.dtype),
        scratch_shapes=[pltpu.VMEM((L, BB, Dd), jnp.float32),
                        pltpu.VMEM((L, BB, Dd), jnp.float32),
                        pltpu.VMEM((L, BB, N), jnp.float32),
                        pltpu.VMEM((L, BB, N), jnp.float32),
                        pltpu.VMEM((L, BB, Dd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(tm(u_pre), tm(gate), cw.reshape(K, Dd), cb[None, :], wx,
      wdt, bdt[None, :], dtbf[None, :], dtbb[None, :],
      Af.swapaxes(0, 1), Ab.swapaxes(0, 1), Df[None, :], Db[None, :])
    return tm(y)[:B]


def _fused_bissm_ref(u_pre, gate, cw, cb, wx, wdt, bdt, dtbf, dtbb,
                     Af, Ab, Df, Db, dt_rank):
    """Composed reference (ground truth + backward): the exact op sequence
    the kernel fuses, in fp32 throughout."""
    from .conv import depthwise_conv1d

    N = Af.shape[1]
    uf = u_pre.astype(jnp.float32)
    u = jax.nn.silu(depthwise_conv1d(uf, cw.astype(jnp.float32),
                                     cb, padding="SAME"))
    proj = jnp.einsum("blk,kr->blr", u, wx,
                      preferred_element_type=jnp.float32)
    dt_raw = proj[..., :dt_rank]
    Bm = proj[..., dt_rank:dt_rank + N]
    Cm = proj[..., dt_rank + N:]
    dtp = jnp.einsum("blr,rd->bld", dt_raw, wdt,
                     preferred_element_type=jnp.float32) + bdt
    dt_f = jax.nn.softplus(dtp + dtbf)
    dt_b = jax.nn.softplus(dtp + dtbb)
    y = _bidir_shared_ref(u, dt_f, dt_b, Af, Ab, Bm, Cm, Df, Db)
    return (y * jax.nn.silu(gate.astype(jnp.float32))).astype(u_pre.dtype)


def _fused_bissm_primal(u_pre, gate, cw, cb, wx, wdt, bdt, dtbf, dtbb,
                        Af, Ab, Df, Db, dt_rank):
    if jax.default_backend() != "tpu":
        return _fused_bissm_ref(u_pre, gate, cw, cb, wx, wdt, bdt, dtbf,
                                dtbb, Af, Ab, Df, Db, dt_rank)
    return _fused_bissm_impl(u_pre, gate, cw, cb, wx, wdt, bdt, dtbf,
                             dtbb, Af, Ab, Df, Db, dt_rank,
                             interpret=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13,))
def _fused_bissm_diffable(u_pre, gate, cw, cb, wx, wdt, bdt, dtbf, dtbb,
                          Af, Ab, Df, Db, dt_rank):
    return _fused_bissm_primal(u_pre, gate, cw, cb, wx, wdt, bdt, dtbf,
                               dtbb, Af, Ab, Df, Db, dt_rank)


def _fused_bissm_fwd(u_pre, gate, cw, cb, wx, wdt, bdt, dtbf, dtbb,
                     Af, Ab, Df, Db, dt_rank):
    args = (u_pre, gate, cw, cb, wx, wdt, bdt, dtbf, dtbb, Af, Ab, Df, Db)
    return _fused_bissm_primal(*args, dt_rank), args


def _fused_bissm_bwd(dt_rank, res, gy):
    _, vjp = jax.vjp(
        lambda *a: _fused_bissm_ref(*a, dt_rank), *res)
    return vjp(gy)


_fused_bissm_diffable.defvjp(_fused_bissm_fwd, _fused_bissm_bwd)


def fused_bidir_ssm(u_pre, gate, cw, cb, wx, wdt, bdt, dtbf, dtbb,
                    Af, Ab, Df, Db, dt_rank: int, interpret=None):
    """Whole bissm interior — depthwise conv, SiLU, x/dt projections,
    shared-stream bidirectional selective scan, and output gating — as one
    batch-major Pallas kernel (reference composition on CPU; interpret=True
    reachable for unit tests). Differentiable via the composed reference."""
    B, L, Dd = u_pre.shape
    N = Af.shape[1]
    R = dt_rank + 2 * N
    flop_record(_scan_flops(B, L, Dd, N, streams=2)
                + 2.0 * B * L * Dd * cw.shape[0]      # conv
                + 2.0 * B * L * Dd * R                # x_proj
                + 2.0 * B * L * dt_rank * Dd          # dt_proj
                + 8.0 * B * L * Dd)                   # silu/gate epilogue
    if interpret:
        return _fused_bissm_impl(u_pre, gate, cw, cb, wx, wdt, bdt, dtbf,
                                 dtbb, Af, Ab, Df, Db, dt_rank,
                                 interpret=True)
    return _fused_bissm_diffable(u_pre, gate, cw, cb, wx, wdt, bdt, dtbf,
                                 dtbb, Af, Ab, Df, Db, dt_rank)
