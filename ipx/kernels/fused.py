"""Fused A-resident KKT matvec kernel (VERDICT r1 item 1).

The Mehrotra iteration's bandwidth floor is set by repeated streams of the
(m, n) constraint matrix: the matrix-free normal operator ``A (d2 * (A^T
v))`` costs two full A streams at the XLA level (two dependent matmuls
cannot fuse — the intermediate ``A^T v`` materializes), and every KKT
refinement sweep adds paired ``A dx`` / ``A^T dy`` streams.

This kernel restores the single-stream structure by walking A in COLUMN
STRIPES: for stripe S the contraction ``t_S = A_S^T v`` needs only A_S, and
the forward product immediately consumes it —

    y  =  A @ (alpha * (A^T v) + w)     [one pass over A]
    t  =  A^T v                          [free by-product]

With ``alpha = d2, w = 0`` this is the whole normal-equations operator in
one A stream (2x less HBM traffic than XLA); with ``alpha = 0`` it is a
fused PAIR of independent matvecs ``(A @ w, A^T v)`` in one stream; with
``alpha = d2`` and a precomputed elementwise ``w`` it evaluates a complete
KKT-refinement right-hand side (see ipx/ipm/mehrotra.py) in one stream
instead of three.

Per-instance 2D kernel; the batched path reaches it through ``jax.vmap``
(Pallas prepends the batch dimension to the grid).  On non-TPU backends it
runs in interpret mode, so CI exercises identical code.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HP = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def stripe_width(m: int, n: int, itemsize: int = 4) -> int | None:
    """Largest column-stripe width that (a) divides n, (b) is a multiple of
    the 128 lane width, (c) keeps the stripe's VMEM footprint under ~2MB.
    A bf16-stored A block feeds the MXU directly (3-way bf16-split dots, no
    f32 upcast copy), so only the stored bytes count — wider stripes and
    fewer grid steps than the f32 path.  None when n has no 128-multiple
    divisor (caller falls back to XLA matmuls)."""
    budget = (2 << 20) // (itemsize * max(m, 1))   # block rows = m
    best = None
    for w in range(128, n + 1, 128):
        if n % w == 0 and w <= max(budget, 128):
            best = w
    return best


def _split3_dot(v, Abf, dims):
    """f32 (1, k) vector x bf16 matrix as THREE single-pass bf16 MXU dots.

    v = h1 + h2 + h3 + err with each h_i the bf16 rounding of the running
    residual (|err| <= 2^-24 |v|), so the sum of the three bf16xbf16
    products IS the f32xbf16 product to f32 accuracy.  Measured on v5e at
    (1,1024)x(1024,256): 2.2x faster than a precision=HIGHEST f32xf32 dot
    of the upcast operand and slightly MORE accurate (1.1e-7 vs 1.4e-7 —
    HIGHEST re-splits the already-bf16 A operand and pays VPU splitting
    work per pass for no accuracy gain)."""
    h1 = v.astype(jnp.bfloat16)
    r1 = v - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    out = None
    for h in (h1, h2, h3):
        p = jax.lax.dot_general(h, Abf, dims,
                                preferred_element_type=jnp.float32)
        out = p if out is None else out + p
    return out


def _ata_kernel(vm_ref, alpha_ref, beta_ref, wn_ref, a_ref, y_ref, t_ref):
    s = pl.program_id(0)
    bf16_a = a_ref.dtype == jnp.bfloat16
    if bf16_a:
        # bf16-stored A: contract the STORED operand directly with a 3-way
        # bf16 split of the f32 vector (see _split3_dot) — no upcast, no
        # HIGHEST multi-pass machinery.
        t = _split3_dot(vm_ref[:], a_ref[:], (((1,), (0,)), ((), ())))
    else:
        Ab = a_ref[:]
        t = jax.lax.dot_general(vm_ref[:], Ab, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_HP)      # (1, NS) = vm @ A_S
    t_ref[:] = t
    # (t + beta) FIRST: in KKT refinement this difference is a tiny residual
    # of two O(1) quantities — scaling by alpha (= d2, up to ~1e10 near
    # convergence) before cancelling would destroy it (measured: stalls the
    # endgame at mu ~ 2e-7 instead of 2e-10)
    w = alpha_ref[:] * (t + beta_ref[:]) + wn_ref[:]
    if bf16_a:
        yp = _split3_dot(w, a_ref[:], (((1,), (1,)), ((), ())))
    else:
        yp = jax.lax.dot_general(w, Ab, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_HP)     # (1, m) = w @ A_S^T

    @pl.when(s == 0)
    def _():
        y_ref[:] = yp

    @pl.when(s > 0)
    def _():
        y_ref[:] = y_ref[:] + yp


@functools.partial(jax.jit, static_argnames=("ns",))
def _ata_apply_2d(A, vm2, alpha2, beta2, wn2, ns: int):
    m, n = A.shape
    grid = (n // ns,)
    y2, t2 = pl.pallas_call(
        _ata_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m), lambda s: (0, 0)),            # vm
            pl.BlockSpec((1, ns), lambda s: (0, s)),           # alpha
            pl.BlockSpec((1, ns), lambda s: (0, s)),           # beta
            pl.BlockSpec((1, ns), lambda s: (0, s)),           # wn
            pl.BlockSpec((m, ns), lambda s: (0, s)),           # A stripe
        ],
        out_specs=[
            pl.BlockSpec((1, m), lambda s: (0, 0)),            # y (accum)
            pl.BlockSpec((1, ns), lambda s: (0, s)),           # t
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=_interpret(),
    )(vm2, alpha2, beta2, wn2, A)
    return y2, t2


def _a_kernel(wn_ref, a_ref, y_ref):
    """Forward-only stripe matvec: y = A @ w, one stream of A, no t."""
    s = pl.program_id(0)
    if a_ref.dtype == jnp.bfloat16:
        yp = _split3_dot(wn_ref[:], a_ref[:], (((1,), (1,)), ((), ())))
    else:
        yp = jax.lax.dot_general(wn_ref[:], a_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_HP)

    @pl.when(s == 0)
    def _():
        y_ref[:] = yp

    @pl.when(s > 0)
    def _():
        y_ref[:] = y_ref[:] + yp


def _at_kernel(vm_ref, a_ref, t_ref):
    """Transpose-only stripe matvec: t = A^T v, one stream of A."""
    if a_ref.dtype == jnp.bfloat16:
        t_ref[:] = _split3_dot(vm_ref[:], a_ref[:], (((1,), (0,)), ((), ())))
    else:
        t_ref[:] = jax.lax.dot_general(
            vm_ref[:], a_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HP)


@functools.partial(jax.jit, static_argnames=("ns",))
def _a_matvec_2d(A, wn2, ns: int):
    m, n = A.shape
    return pl.pallas_call(
        _a_kernel,
        grid=(n // ns,),
        in_specs=[
            pl.BlockSpec((1, ns), lambda s: (0, s)),
            pl.BlockSpec((m, ns), lambda s: (0, s)),
        ],
        out_specs=pl.BlockSpec((1, m), lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.float32),
        interpret=_interpret(),
    )(wn2, A)


@functools.partial(jax.jit, static_argnames=("ns",))
def _at_matvec_2d(A, vm2, ns: int):
    m, n = A.shape
    return pl.pallas_call(
        _at_kernel,
        grid=(n // ns,),
        in_specs=[
            pl.BlockSpec((1, m), lambda s: (0, 0)),
            pl.BlockSpec((m, ns), lambda s: (0, s)),
        ],
        out_specs=pl.BlockSpec((1, ns), lambda s: (0, s)),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        interpret=_interpret(),
    )(vm2, A)


def a_matvec(A: jax.Array, w: jax.Array) -> jax.Array:
    """One-stream ``A @ w`` through the stripe kernel ((m,) f32 out).

    Replaces XLA ``mv(A, w, HIGHEST)`` on the fused path: for a bf16-stored
    A the XLA route pays multi-pass HIGHEST overhead per stream; the kernel
    runs the 3-way bf16-split contraction at the DMA floor."""
    m, n = A.shape
    ns = stripe_width(m, n, A.dtype.itemsize)
    return _a_matvec_2d(A, w.reshape(1, n).astype(jnp.float32), ns)[0]


def at_matvec(A: jax.Array, v: jax.Array) -> jax.Array:
    """One-stream ``A^T v`` through the stripe kernel ((n,) f32 out)."""
    m, n = A.shape
    ns = stripe_width(m, n, A.dtype.itemsize)
    return _at_matvec_2d(A, v.reshape(1, m).astype(jnp.float32), ns)[0]


def ata_apply(A: jax.Array, vm: jax.Array, alpha, wn, beta=None):
    """One-A-stream evaluation of

        y = A @ (alpha * (A^T vm + beta) + wn),    t = A^T vm.

    ``alpha``/``beta``/``wn`` may be ``None`` (treated as 0 — and an
    ``alpha=None`` call is the fused independent PAIR ``(A @ wn, A^T vm)``).
    ``beta`` exists for cancellation-critical sums: ``t + beta`` is formed
    BEFORE the ``alpha`` scaling (see kernel comment).  Returns ``(y, t)``
    as (m,), (n,) float32.  Caller must ensure ``stripe_width(m, n)`` is
    not None.
    """
    m, n = A.shape
    ns = stripe_width(m, n, A.dtype.itemsize)
    zero_n = jnp.zeros((1, n), jnp.float32)
    vm2 = vm.reshape(1, m).astype(jnp.float32)
    alpha2 = zero_n if alpha is None else alpha.reshape(1, n).astype(jnp.float32)
    beta2 = zero_n if beta is None else beta.reshape(1, n).astype(jnp.float32)
    wn2 = zero_n if wn is None else wn.reshape(1, n).astype(jnp.float32)
    y2, t2 = _ata_apply_2d(A, vm2, alpha2, beta2, wn2, ns)
    return y2[0], t2[0]
