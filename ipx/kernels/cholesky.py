"""Pallas TPU batched blocked Cholesky + triangular solves (SURVEY.md N9).

TPU-native replacement for the reference's LAPACK ``dpotrf``/``dpotrs``
(SURVEY.md §2.3): the reference reaches them through ``numpy.linalg`` on CPU;
here they are Mosaic kernels designed around the MXU.

Design (right-looking blocked factorization, block size NB=128 = MXU tile):

  for each panel k:
    1. factor the NB x NB diagonal block with an in-register column loop,
       CO-COMPUTING inv(L_kk) by forward substitution in the same loop;
    2. panel TRSM becomes an MXU matmul:  L[below,k] = A[below,k] @ inv(L_kk)^T
    3. trailing update is an MXU syrk:    A[rest,rest] -= P @ P^T

Because the diagonal-block inverses are saved, the subsequent triangular
solves (:func:`solve_triangular_batched`) are *blocked substitutions whose
inner steps are matmuls with inv(L_kk)* — no sequential scalar substitution
anywhere outside the 128-wide column loop.

Mosaic constraints shape the implementation: no ``dynamic_slice`` on register
values, so the column loop uses masked whole-tile selects built from
``broadcasted_iota`` (one (NB, NB) mask per step — VPU work, negligible next
to the O(m^3) MXU panels), and the factorization happens in place in the
output ref via ``input_output_aliases`` with static-slice ref reads/writes.

One grid program per batch instance; the whole matrix lives in VMEM (fine up
to m ~ 1280 in f32; larger matrices take the XLA fallback selected by
``ipx.options.chol_backend``).  On non-TPU backends the kernels run in Pallas
interpret mode so CI exercises identical code (SURVEY.md §4.2 fake-backend
principle).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128  # panel width == MXU tile
_HP = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _factor_diag_block(blk):
    """Cholesky of an (NB, NB) SPD block + inverse of its factor.

    Column loop j = 0..NB-1: rank-1 right-looking elimination for L's column
    j, fused with the forward-substitution recurrence
    ``inv(L)[j,:] = (e_j - L[j,:] @ inv(L)) / L[jj]`` (rows < j of W are
    already final, rows >= j still zero, so the matvec needs no masking).
    All indexing is via iota masks — Mosaic has no dynamic_slice on values.
    """
    q = blk.shape[0]
    dt = blk.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (q, q), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (q, q), 1)
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (q, 1), 0)
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (1, q), 1)
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    zero = jnp.zeros((), dt)

    def body(j, carry):
        a, L, W = carry
        ajj = jnp.sum(jnp.where((rows == j) & (cols == j), a, zero))
        piv = jnp.sqrt(jnp.maximum(ajj, tiny))
        inv_piv = 1.0 / piv
        col = jnp.sum(jnp.where(cols == j, a, zero), axis=1, keepdims=True)
        l = jnp.where(rows_c >= j, col * inv_piv, zero)          # (q, 1)
        a = a - l * jnp.transpose(l)                              # rank-1
        L = jnp.where(cols == j, l, L)
        lrow = jnp.sum(jnp.where(rows == j, L, zero), axis=0,
                       keepdims=True)                             # (1, q)
        ej = (cols_r == j).astype(dt)
        wrow = (ej - jnp.dot(lrow, W, preferred_element_type=dt,
                             precision=_HP)) * inv_piv
        # the dot includes L[j,j]*W[j,:], but W[j,:] is still zero — exact.
        W = jnp.where(rows == j, wrow, W)
        return a, L, W

    zeros = jnp.zeros_like(blk)
    _, L, W = jax.lax.fori_loop(0, q, body, (blk, zeros, zeros))
    return L, W


def _cholesky_kernel(a_ref, l_ref, w_ref, *, m: int):
    """One batch instance, factored IN PLACE in l_ref (aliased with a_ref).

    l_ref: (1, m, m) — holds A on entry, L on exit (strict upper zeroed);
    w_ref: (1, m//NB, NB, NB) diagonal-block inverses.
    All slicing below is static (Python ints), the Mosaic-supported path.
    """
    # The HBM buffers are aliased, but the pipelined VMEM blocks are distinct
    # buffers — l_ref's VMEM block is NOT initialized with A. Copy explicitly,
    # then work entirely in l_ref.
    l_ref[0] = a_ref[0]
    nblk = m // NB
    for k in range(nblk):
        o = k * NB
        Lkk, Wkk = _factor_diag_block(l_ref[0, o:o + NB, o:o + NB])
        l_ref[0, o:o + NB, o:o + NB] = Lkk
        w_ref[0, k] = Wkk
        if o + NB < m:
            panel = jnp.dot(l_ref[0, o + NB:, o:o + NB], jnp.transpose(Wkk),
                            preferred_element_type=jnp.float32, precision=_HP)
            l_ref[0, o + NB:, o:o + NB] = panel
            # trailing syrk on the MXU
            l_ref[0, o + NB:, o + NB:] = l_ref[0, o + NB:, o + NB:] - jnp.dot(
                panel, jnp.transpose(panel),
                preferred_element_type=jnp.float32, precision=_HP)
            # clear this panel-row's strict upper blocks (they still hold A)
            l_ref[0, o:o + NB, o + NB:] = jnp.zeros((NB, m - o - NB),
                                                    jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_batched(M: jax.Array, interpret: bool | None = None):
    """Batched Cholesky: M (B, m, m) SPD -> (L (B, m, m), W (B, m/NB, NB, NB)).

    ``W`` holds inv(L_kk) for each diagonal block — consumed by
    :func:`solve_triangular_batched` to turn triangular solves into matmuls.
    m must be a multiple of 128 (pad upstream; ipx/linsys/normal_eq.py does).
    """
    if interpret is None:
        interpret = _interpret()
    B, m, m2 = M.shape
    assert m == m2 and m % NB == 0, f"m={m} must be a multiple of {NB}"
    nblk = m // NB
    kernel = functools.partial(_cholesky_kernel, m=m)
    L, W = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, m, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, m, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblk, NB, NB), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, m), jnp.float32),
            jax.ShapeDtypeStruct((B, nblk, NB, NB), jnp.float32),
        ),
        input_output_aliases={0: 0},   # factor in place: A buffer becomes L
        interpret=interpret,
    )(M.astype(jnp.float32))
    return L, W


def _solve_kernel(l_ref, w_ref, b_ref, x_ref, *, m: int, lower: bool):
    """Blocked triangular solve for one instance, rhs (1, m, 1).

    lower=True:  solve L y = b   (forward, uses W = inv(L_kk))
    lower=False: solve L^T x = b (backward, uses W^T)
    Each block step is an MXU matmul; previously solved blocks are read back
    from x_ref with static slices (sequential within one grid program).
    """
    nblk = m // NB
    order = range(nblk) if lower else range(nblk - 1, -1, -1)
    for k in order:
        o = k * NB
        Wk = w_ref[0, k]
        bk = b_ref[0, o:o + NB, :]                       # (NB, 1)
        if lower:
            if o > 0:
                r = bk - jnp.dot(l_ref[0, o:o + NB, :o], x_ref[0, :o, :],
                                 preferred_element_type=jnp.float32,
                                 precision=_HP)
            else:
                r = bk
            yk = jnp.dot(Wk, r, preferred_element_type=jnp.float32,
                         precision=_HP)
        else:
            if o + NB < m:
                r = bk - jnp.dot(jnp.transpose(l_ref[0, o + NB:, o:o + NB]),
                                 x_ref[0, o + NB:, :],
                                 preferred_element_type=jnp.float32,
                                 precision=_HP)
            else:
                r = bk
            yk = jnp.dot(jnp.transpose(Wk), r,
                         preferred_element_type=jnp.float32, precision=_HP)
        x_ref[0, o:o + NB, :] = yk


@functools.partial(jax.jit, static_argnames=("lower", "interpret"))
def solve_triangular_batched(L: jax.Array, W: jax.Array, b: jax.Array,
                             lower: bool = True,
                             interpret: bool | None = None):
    """Solve L y = b (lower=True) or L^T y = b (lower=False), batched.

    L: (B, m, m); W: (B, m/NB, NB, NB) diag-block inverses from
    :func:`cholesky_batched`; b: (B, m)."""
    if interpret is None:
        interpret = _interpret()
    B, m, _ = L.shape
    nblk = m // NB
    kernel = functools.partial(_solve_kernel, m=m, lower=lower)
    x = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, m, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblk, NB, NB), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m, 1), jnp.float32),
        interpret=interpret,
    )(L, W, b[..., None].astype(jnp.float32))
    return x[..., 0]


def chol_solve_batched(L, W, b, interpret: bool | None = None):
    """Solve (L L^T) x = b given the batched factor."""
    y = solve_triangular_batched(L, W, b, lower=True, interpret=interpret)
    return solve_triangular_batched(L, W, y, lower=False, interpret=interpret)


# --- single-instance conveniences (used by normal_eq under vmap) -----------

def cholesky(M: jax.Array):
    """Single (m, m) Cholesky via the batched kernel; returns L only."""
    L, _ = cholesky_batched(M[None])
    return L[0]
