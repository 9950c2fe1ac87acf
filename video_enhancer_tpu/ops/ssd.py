"""SSD (state-space dual / Mamba-2) scan — chunked matmul form.

The long-L spatial raster scan in VSRM (L = H*W, thousands of steps) is the
model's dominant cost. The Mamba-1 recurrence with per-(channel, state)
decays can only be evaluated with elementwise scans (VPU-bound: the Hillis
kernel in ops/scan.py does O(N*D*log C) vector work per chunk). Restricting
the decay to a *scalar per head* (the Mamba-2 / SSD parameterization) makes
the chunk computation a handful of dense matmuls that run on the MXU:

    within a chunk of length Q (g = cumsum(dt * A), all exponents <= 0):
      Y_intra = ((C B^T) o exp(g_t - g_s) o causal_mask) @ (dt * x)
      S_chunk = (B o exp(g_Q - g_s))^T @ (dt * x)
    across chunks (length L/Q, cheap):
      S_k = exp(g_Q) S_{k-1} + S_chunk_k
      Y_inter = (C o exp(g_t)) @ S_{k-1}

This replaces the hot loop of the reference's sequential Python scan
(reference models/backbones/mamba/ea_mamba_blocks.py:120-147) with
MXU-rate work. Pure jnp, so autodiff works without a custom VJP.

Shapes: x ``(B, L, H, P)`` per-head values; dt ``(B, L, H)`` step sizes;
A ``(H,)`` negative decay rates; Bm, Cm ``(B, L, H, N)`` input/output
projections. Returns y ``(B, L, H, P)`` (the caller adds any D*x skip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.flops import record as flop_record

__all__ = ["ssd_ref", "ssd", "ssd_shared", "ssd_chunk_size"]


def ssd_ref(x, dt, A, Bm, Cm, h0=None):
    """Sequential lax.scan ground truth. Returns (y, h_last).

    h: (B, H, N, P);  h_t = exp(dt_t*A) h_{t-1} + dt_t B_t x_t^T;
    y_t = C_t^T h_t.
    """
    b, L, H, P = x.shape
    Af = A.astype(jnp.float32)

    if h0 is None:
        h0 = jnp.zeros((b, H, Bm.shape[-1], P), jnp.float32) \
            + (x[:, 0, :, None, :] * 0).astype(jnp.float32)

    def step(h, inputs):
        x_t, dt_t, b_t, c_t = inputs  # (B,H,P),(B,H),(B,H,N),(B,H,N)
        dtf = dt_t.astype(jnp.float32)
        a = jnp.exp(dtf * Af)                                  # (B,H)
        drive = jnp.einsum("bhn,bhp->bhnp", b_t.astype(jnp.float32),
                           (dtf[..., None] * x_t.astype(jnp.float32)))
        h = a[..., None, None] * h + drive
        y = jnp.einsum("bhn,bhnp->bhp", c_t.astype(jnp.float32), h)
        return h, y

    xs = (jnp.moveaxis(x, 1, 0), jnp.moveaxis(dt, 1, 0),
          jnp.moveaxis(Bm, 1, 0), jnp.moveaxis(Cm, 1, 0))
    h_last, ys = jax.lax.scan(step, h0, xs)
    return jnp.moveaxis(ys, 0, 1).astype(x.dtype), h_last


def ssd_chunk_size(L: int, target: int = 128) -> int:
    """Largest power of two <= min(L, target)."""
    c = 1
    while c * 2 <= min(L, target):
        c *= 2
    return c


@functools.partial(jax.jit, static_argnames=("chunk",))
def ssd(x, dt, A, Bm, Cm, chunk: int = 128):
    """Chunked matmul-form SSD scan. Returns y ``(B, L, H, P)``.

    Matmul inputs stay in the input dtype (bf16 on TPU) with fp32
    accumulation; decay exponents are computed in fp32 (all <= 0, so
    exp never overflows and underflow saturates to 0 exactly like the
    sequential form).
    """
    b, L, H, P = x.shape
    N = Bm.shape[-1]
    Q = min(chunk, ssd_chunk_size(L, chunk))
    pad = (-L) % Q
    if pad:
        # dt = 0 -> decay 1, drive 0: pure passthrough steps.
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0), (0, 0)))
    K = (L + pad) // Q

    cdt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32

    # Head-major layout (b, K, H, Q, ...): every contraction below is then a
    # clean batched matmul over the trailing two axes — no mid-pipeline
    # transposes of the (Q, Q) tensors.
    def hm(t):  # (b, L, H, ...) -> (b, K, H, Q, ...)
        return t.reshape((b, K, Q) + t.shape[2:]).swapaxes(2, 3)

    xc = hm(x).astype(cdt)                                   # (b,K,H,Q,P)
    dtc = hm(dt).astype(jnp.float32)                         # (b,K,H,Q)
    Bc = hm(Bm).astype(cdt)                                  # (b,K,H,Q,N)
    Cc = hm(Cm).astype(cdt)                                  # (b,K,H,Q,N)

    g = jnp.cumsum(dtc * A.astype(jnp.float32)[:, None], axis=3)
    G = g[..., -1]                                           # (b,K,H)

    xdt = (xc.astype(jnp.float32) * dtc[..., None]).astype(cdt)

    # ---- intra-chunk: ((C B^T) o decay o mask) @ (dt x) --------------------
    CB = jnp.einsum("bkhqn,bkhsn->bkhqs", Cc, Bc,
                    preferred_element_type=jnp.float32)
    ldiff = g[..., :, None] - g[..., None, :]                # (b,K,H,Q,S)
    mask = (jnp.arange(Q)[:, None] >= jnp.arange(Q)[None, :])
    # exp <= 1 always; fuses with the CB multiply (no fp32 (Q,Q) tensor
    # needs to round-trip HBM).
    W = (CB * jnp.exp(jnp.where(mask, ldiff, -jnp.inf))).astype(cdt)
    y_intra = jnp.einsum("bkhqs,bkhsp->bkhqp", W, xdt,
                         preferred_element_type=jnp.float32)

    # ---- chunk states: S_chunk = (B o exp(G - g))^T @ (dt x) ---------------
    to_end = jnp.exp(G[..., None] - g)                       # (b,K,H,Q)
    S_chunk = jnp.einsum("bkhqn,bkhqp->bkhnp",
                         (Bc.astype(jnp.float32)
                          * to_end[..., None]).astype(cdt),
                         xdt, preferred_element_type=jnp.float32)

    # ---- inter-chunk recurrence: log-depth associative scan over K ---------
    # (a sequential lax.scan costs K dispatch-bound steps; K is hundreds for
    # video rasters).
    cdecay = jnp.exp(G)                                      # (b,K,H)

    def combine(lhs, rhs):
        a_l, s_l = lhs
        a_r, s_r = rhs
        return a_l * a_r, a_r[..., None, None] * s_l + s_r

    a_inc, S_inc = jax.lax.associative_scan(
        combine, (cdecay, S_chunk), axis=1)                  # inclusive
    # State entering chunk k = inclusive state of chunk k-1.
    S_prev = jnp.pad(S_inc, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :K]

    # ---- inter contribution: (C o exp(g)) @ S_prev -------------------------
    y_inter = jnp.einsum("bkhqn,bkhnp->bkhqp",
                         (Cc.astype(jnp.float32)
                          * jnp.exp(g)[..., None]).astype(cdt),
                         S_prev.astype(cdt),
                         preferred_element_type=jnp.float32)

    y = (y_intra + y_inter).swapaxes(2, 3).reshape(b, K * Q, H, P)[:, :L]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused Pallas kernel: the whole chunk pipeline (decay matrix, intra-chunk
# matmuls, state carry, inter contribution) runs in VMEM per (batch, head)
# with the chunk axis as a sequential grid dimension. B/C are SHARED across
# heads (groups=1), so they are loaded once per chunk without broadcasting
# an (b, L, H, N) tensor through HBM. The composed XLA form above pays ~2x
# in layout/materialization overhead; this kernel is the TPU fast path.
# ---------------------------------------------------------------------------


def _ssd_kernel(a_ref, u_ref, dt_ref, b_ref, c_ref, y_ref, state,
                *, Q, N, P, H, reverse=False):
    """One (batch, chunk) program; heads are a static in-kernel loop so
    every block keeps (Q, lanes>=128)-shaped last dims. Block layouts:
    a_ref (H,1) SMEM; u_ref, y_ref (1,Q,H*P); dt_ref (1,Q,H);
    b_ref, c_ref (1,Q,N); state scratch (N, H*P) fp32.

    ``reverse`` runs the anti-causal scan flip-free: inclusive *suffix*
    sums for the decays, transposed causal mask, and the chunk grid
    iterated back-to-front (the index maps handle that)."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        state[:, :] = jnp.zeros_like(state)

    Bc = b_ref[0]                                        # (Q,N)
    Cc = c_ref[0]                                        # (Q,N)
    dt_all = dt_ref[0].astype(jnp.float32)               # (Q,H)

    # Everything stays 2-D: Pallas TPU has no 1-D cumsum, and row/column
    # vectors are built via triangular / outer-product matmuls instead.
    qi = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
    causal = (qi <= si) if reverse else (qi >= si)
    tri = causal.astype(jnp.float32)                     # (Q,Q)
    ones_col = jnp.ones((Q, 1), jnp.float32)

    def outer(colA, colB):  # (Q,1),(Q,1) -> (Q,Q): colA[q] * colB[s]
        return jax.lax.dot_general(colA, colB, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # B/C are shared across heads (groups=1): C B^T is head-independent,
    # so the (Q,N)@(N,Q) matmul is hoisted out of the head loop.
    CB = jax.lax.dot_general(Cc, Bc, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    for h in range(H):
        a = a_ref[h, 0]
        u = u_ref[0, :, h * P:(h + 1) * P]               # (Q,P)
        dta = dt_all[:, h:h + 1] * a                     # (Q,1)

        # inclusive prefix (forward) / suffix (reverse) sums.
        g = jax.lax.dot_general(tri, dta, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (Q,1)
        G = jnp.sum(dta)                                 # scalar
        xdt = (u.astype(jnp.float32) * dt_all[:, h:h + 1]).astype(u.dtype)

        # intra-chunk: ((C B^T) o exp(g_q - g_s) o mask) @ xdt
        ldiff = outer(g, ones_col) - outer(ones_col, g)  # g[q] - g[s]
        W = (CB * jnp.exp(jnp.where(causal, ldiff,
                                    -jnp.inf))).astype(u.dtype)
        y = jax.lax.dot_general(W, xdt, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

        # inter: (C o exp(g)) @ state_in
        st = state[:, h * P:(h + 1) * P]
        Cg = (Cc.astype(jnp.float32) * jnp.exp(g)).astype(u.dtype)
        y = y + jax.lax.dot_general(Cg, st.astype(u.dtype),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

        # state carry: exp(G) * state + (B o exp(G - g))^T @ xdt
        Bg = (Bc.astype(jnp.float32) * jnp.exp(G - g)).astype(u.dtype)
        S_new = jax.lax.dot_general(Bg, xdt, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        state[:, h * P:(h + 1) * P] = jnp.exp(G) * st + S_new

        y_ref[0, :, h * P:(h + 1) * P] = y.astype(y_ref.dtype)


def _ssd_batched_kernel(a_ref, u_ref, dt_ref, b_ref, c_ref, y_ref, state,
                        *, Q, N, P, H, B, reverse=False):
    """Whole-batch chunk program: grid (K,) sequential with the FULL batch
    in every block and python-unrolled (b, h) loops. The per-(batch,chunk)
    grid of ``_ssd_kernel`` ran B*K programs whose ~us-scale setup swamped
    the sub-us of MXU work per program (measured 27% faster at the VSRM
    shape, B=7 L=57600: 2.01 vs 2.76 ms per direction at Q=256). States
    for all batches live in one VMEM scratch (B*N, H*P)."""
    ki = pl.program_id(0)

    @pl.when(ki == 0)
    def _init():
        state[:, :] = jnp.zeros_like(state)

    qi = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
    causal = (qi <= si) if reverse else (qi >= si)
    tri = causal.astype(jnp.float32)
    ones_col = jnp.ones((Q, 1), jnp.float32)

    def outer(colA, colB):  # (Q,1),(Q,1) -> (Q,Q): colA[q] * colB[s]
        return jax.lax.dot_general(colA, colB, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    for bi in range(B):
        Bc = b_ref[bi]                                   # (Q,N)
        Cc = c_ref[bi]                                   # (Q,N)
        dt_all = dt_ref[bi].astype(jnp.float32)          # (Q,H)
        # B/C shared across heads: C B^T hoisted out of the head loop.
        CB = jax.lax.dot_general(Cc, Bc, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        for h in range(H):
            a = a_ref[h, 0]
            u = u_ref[bi, :, h * P:(h + 1) * P]          # (Q,P)
            dta = dt_all[:, h:h + 1] * a                 # (Q,1)
            g = jax.lax.dot_general(tri, dta, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            G = jnp.sum(dta)
            xdt = (u.astype(jnp.float32)
                   * dt_all[:, h:h + 1]).astype(u.dtype)
            ldiff = outer(g, ones_col) - outer(ones_col, g)
            W = (CB * jnp.exp(jnp.where(causal, ldiff,
                                        -jnp.inf))).astype(u.dtype)
            y = jax.lax.dot_general(W, xdt, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            st = state[bi * N:(bi + 1) * N, h * P:(h + 1) * P]
            Cg = (Cc.astype(jnp.float32) * jnp.exp(g)).astype(u.dtype)
            y = y + jax.lax.dot_general(Cg, st.astype(u.dtype),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            Bg = (Bc.astype(jnp.float32) * jnp.exp(G - g)).astype(u.dtype)
            S_new = jax.lax.dot_general(Bg, xdt, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            state[bi * N:(bi + 1) * N, h * P:(h + 1) * P] = \
                jnp.exp(G) * st + S_new
            y_ref[bi, :, h * P:(h + 1) * P] = y.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "chunk", "reverse",
                                              "interpret"))
def _ssd_shared_pallas_batched_impl(x, dt, A, Bm, Cm, heads, chunk=256,
                                    reverse=False, interpret=False):
    b, L, inner = x.shape
    H = heads
    P = inner // H
    N = Bm.shape[-1]
    Q = min(chunk, ssd_chunk_size(L, chunk))
    pad = (-L) % Q
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0)))
        Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0)))
    K = (L + pad) // Q

    if reverse:
        def seq_ix(ki):
            return (0, K - 1 - ki, 0)
    else:
        def seq_ix(ki):
            return (0, ki, 0)

    kernel = functools.partial(_ssd_batched_kernel, Q=Q, N=N, P=P, H=H,
                               B=b, reverse=reverse)
    y = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((H, 1), lambda ki: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, Q, inner), seq_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, Q, H), seq_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, Q, N), seq_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, Q, N), seq_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, Q, inner), seq_ix,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, L + pad, inner), x.dtype),
        scratch_shapes=[pltpu.VMEM((b * N, inner), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(A.reshape(H, 1).astype(jnp.float32), x, dt.astype(jnp.float32),
      Bm, Cm)
    return y[:, :L]


# Whole-batch blocks must fit VMEM with double buffering; above this the
# per-(batch, chunk) grid is used instead.
_BATCHED_BLOCK_BYTES = 4 << 20


@functools.partial(jax.jit, static_argnames=("heads", "chunk", "reverse",
                                              "interpret"))
def _ssd_shared_pallas_impl(x, dt, A, Bm, Cm, heads, chunk=256,
                            reverse=False, interpret=False):
    b, L, inner = x.shape
    H = heads
    P = inner // H
    N = Bm.shape[-1]
    Q = min(chunk, ssd_chunk_size(L, chunk))
    pad = (-L) % Q
    if pad:
        # Padding sits at the sequence END; with dt = 0 the padded steps are
        # pure passthrough in either direction.
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0)))
        Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0)))
    K = (L + pad) // Q

    if reverse:
        def seq_ix(bi, ki):
            return (bi, K - 1 - ki, 0)
    else:
        def seq_ix(bi, ki):
            return (bi, ki, 0)

    kernel = functools.partial(_ssd_kernel, Q=Q, N=N, P=P, H=H,
                               reverse=reverse)
    y = pl.pallas_call(
        kernel,
        grid=(b, K),
        in_specs=[
            pl.BlockSpec((H, 1), lambda bi, ki: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Q, inner), seq_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, H), seq_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, N), seq_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, N), seq_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, inner), seq_ix,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, L + pad, inner), x.dtype),
        scratch_shapes=[pltpu.VMEM((N, inner), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(A.reshape(H, 1).astype(jnp.float32), x, dt.astype(jnp.float32),
      Bm, Cm)
    return y[:, :L]


def _ssd_shared_jnp(x, dt, A, Bm, Cm, chunk=256, reverse=False):
    b, L, H, P = x.shape
    N = Bm.shape[-1]
    Bh = jnp.broadcast_to(Bm[:, :, None, :], (b, L, H, N))
    Ch = jnp.broadcast_to(Cm[:, :, None, :], (b, L, H, N))
    if reverse:
        flip = lambda t: jnp.flip(t, axis=1)
        return flip(ssd(flip(x), flip(dt), A, flip(Bh), flip(Ch),
                        chunk=chunk))
    return ssd(x, dt, A, Bh, Ch, chunk=chunk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ssd_shared_diffable(x, dt, A, Bm, Cm, chunk, reverse):
    b, L, H, P = x.shape
    interpret = jax.default_backend() != "tpu"
    Q = min(chunk, ssd_chunk_size(L, chunk))
    impl = (_ssd_shared_pallas_batched_impl
            if b * Q * H * P * x.dtype.itemsize <= _BATCHED_BLOCK_BYTES
            else _ssd_shared_pallas_impl)
    y = impl(x.reshape(b, L, H * P), dt, A, Bm, Cm,
             heads=H, chunk=chunk, reverse=reverse, interpret=interpret)
    return y.reshape(b, L, H, P)


def _ssd_shared_fwd(x, dt, A, Bm, Cm, chunk, reverse):
    return (_ssd_shared_diffable(x, dt, A, Bm, Cm, chunk, reverse),
            (x, dt, A, Bm, Cm))


def _ssd_shared_bwd(chunk, reverse, res, gy):
    _, vjp = jax.vjp(
        lambda *a: _ssd_shared_jnp(*a, chunk=chunk, reverse=reverse), *res)
    return vjp(gy)


_ssd_shared_diffable.defvjp(_ssd_shared_fwd, _ssd_shared_bwd)


def ssd_shared(x, dt, A, Bm, Cm, chunk: int = 256, reverse: bool = False,
               use_pallas: bool | None = None):
    """SSD scan with B/C shared across heads (groups=1, the Mamba-2 default).

    x ``(B, L, H, P)``, dt ``(B, L, H)``, A ``(H,)``, Bm/Cm ``(B, L, N)``.
    ``reverse`` scans anti-causally (flip-free in the kernel). TPU: fused
    Pallas kernel (differentiable; backward recomputes through the jnp
    chunked form). Elsewhere: the pure-jnp chunked form.
    """
    if use_pallas is None:
        # Auto-select the Pallas kernel only for half-precision inputs (the
        # serving path; bench.py casts to bf16). Training runs f32, where
        # XLA stages the kernel's full f32 operands on the VMEM stack and
        # the scoped allocation blows the 16 MB limit (measured: VSRM train
        # step at (16,1024,128) f32 -> 20.1 MB scoped-vmem OOM). The jnp
        # chunked form is differentiable and MXU-mapped, so f32 callers
        # lose nothing structural.
        use_pallas = (jax.default_backend() == "tpu"
                      and x.dtype in (jnp.bfloat16, jnp.float16))
    if use_pallas:
        b, L, H, P = x.shape
        N = Bm.shape[-1]
        Q = min(chunk, ssd_chunk_size(L, chunk))
        K = -(-L // Q)
        # Matmul terms per (batch, chunk): CB (2Q^2 N, hoisted out of the
        # head loop) + per head: intra W@xdt (2Q^2 P), tri-cumsum (2Q^2),
        # inter Cg@state + state update (4QNP).
        flop_record(b * K * (2.0 * Q * Q * N
                             + H * (2.0 * Q * Q * (P + 1)
                                    + 4.0 * Q * N * P)))
        return _ssd_shared_diffable(x, dt, A, Bm, Cm, chunk, reverse)
    return _ssd_shared_jnp(x, dt, A, Bm, Cm, chunk=chunk, reverse=reverse)
