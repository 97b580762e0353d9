"""Pallas TPU batched blocked Cholesky + triangular solves (SURVEY.md N9).

TPU-native replacement for the reference's LAPACK ``dpotrf``/``dpotrs``
(SURVEY.md §2.3): the reference reaches them through ``numpy.linalg`` on CPU;
here they are Mosaic kernels designed around the MXU.

Design (right-looking blocked factorization, block size NB=128 = MXU tile):

  for each panel k:
    1. factor the NB x NB diagonal block TWO-LEVEL (32-wide sub-panels:
       short masked column loops + MXU sub-TRSM/syrk), assembling inv(L_kk)
       from the sub-block inverses by trtri-style combines — phase A,
       batched over many instances since only the blocks live in VMEM;
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


def _subst_invert(T, base: int = 8, mosaic: bool = True):
    """Batched inv of (K, h, h) lower-triangular blocks, trtri-style.

    The sequential-latency killer of the diagonal chain: a direct h-step
    substitution is h dependent launches, but the trtri recursion halves
    the block (STACKING both halves into the batch axis so each level is
    ONE recursion) down to ``base``, where the substitution loop runs —
    base sequential steps + log2(h/base) matmul combine levels instead of
    h steps.  Same stable combine algebra as normal_eq._invert_lower_blocks.

    ``mosaic=False`` selects the static-slice base formulation that is only
    legal OUTSIDE Pallas kernels (see :func:`_subst_invert_xla`).
    """
    K, h, _ = T.shape
    if h > base:
        hh = h // 2
        sub = jnp.concatenate([T[:, :hh, :hh], T[:, hh:, hh:]], axis=0)
        W = _subst_invert(sub, base, mosaic)
        return _combine_lower_inv(W[:K], W[K:], T[:, hh:, :hh])
    return _subst_invert_loop(T) if mosaic else _subst_invert_xla(T)


def _subst_invert_xla(T):
    """XLA-level base of :func:`_subst_invert`: the same row-wise forward
    substitution, but with STATIC slices and broadcast reductions instead
    of iota masks and ones-matmul replication (both exist only because
    Mosaic forbids value dynamic-slices and (K,1,1) layouts).  The python
    loop unrolls at trace time into one short chain of VPU ops that XLA
    fuses into a couple of launches — the diagonal chain at m=1024 is
    launch-count-bound, not FLOP-bound."""
    K, h, _ = T.shape
    dt = T.dtype
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    rows = []                                     # rows[i]: (K, 1, h)
    for i in range(h):
        e_row = jnp.zeros((K, 1, h), dt).at[:, :, i].set(1.0)
        if i:
            W_above = jnp.concatenate(rows, axis=1)        # (K, i, h)
            prod = jnp.sum(T[:, i, :i][:, :, None] * W_above,
                           axis=1, keepdims=True)          # (K, 1, h)
            r = e_row - prod
        else:
            r = e_row
        dii = jnp.maximum(T[:, i:i + 1, i:i + 1], tiny)    # (K, 1, 1)
        rows.append(r / dii)
    return jnp.concatenate(rows, axis=1)


def _subst_invert_loop(T):
    """Base case of :func:`_subst_invert`: ROW-WISE forward substitution —
    h sequential steps, each a masked (K,1,h)x(K,h,h) batched dot; all
    indexing via iota masks (no dynamic slices on register values); the
    short loop is fully unrolled so XLA fuses across steps (one launch
    instead of h)."""
    K, h, _ = T.shape
    dt = T.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, h), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, h, h), 2)
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h), 2)
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    zero = jnp.zeros((), dt)
    ones_row = jnp.ones((K, h, h), dt)

    def body(i, W):
        # w_i = (e_i - T[i, :i] @ W[:i, :]) / T[i, i]
        t_row = jnp.sum(jnp.where(rows == i, T, zero), axis=1,
                        keepdims=True)                          # (K,1,h)
        t_below = jnp.where(cols_r < i, t_row, zero)
        prod = jax.lax.dot_general(t_below, W, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=dt, precision=_HP)
        d_row = jnp.where((cols_r == i), t_row, zero)           # T[i,i] at col i
        dii = jax.lax.dot_general(d_row, ones_row,
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=dt,
                                  precision=_HP)                # replicated
        e_row = (cols_r == i).astype(dt)
        w_row = (e_row - prod) / jnp.maximum(dii, tiny)
        return jnp.where(rows == i, w_row, W)

    return jax.lax.fori_loop(0, h, body, jnp.zeros_like(T), unroll=True)


def _combine_lower_inv(Wtop, Wbot, Bblk):
    """One trtri combine level:  inv([[A,0],[B,C]]) = [[iA,0],[-iC B iA,iC]]
    given iA = Wtop, iC = Wbot, B = Bblk — two batched MXU matmuls."""
    bs, w, _ = Wtop.shape
    dt = Wtop.dtype
    off = -_bmm(Wbot, _bmm(Bblk, Wtop))
    top = jnp.concatenate([Wtop, jnp.zeros((bs, w, Wbot.shape[-1]), dt)],
                          axis=2)
    bot = jnp.concatenate([off, Wbot], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _invert_lower_stable(L):
    """inv of (BS, q, q) lower-triangular factors, LAPACK-trtri style:
    the q/4-sized diagonal sub-blocks are inverted by batched forward
    substitution (all 4 STACKED into the batch axis — one substitution
    loop), then two masked-matmul combine levels assemble inv(L):

        inv([[A,0],[B,C]]) = [[iA, 0], [-iC B iA, iC]]

    Replaces the nilpotent log-squaring product, whose large intermediate
    N-powers leak f32 rounding on ill-conditioned endgame blocks (measured:
    cost a convergence probe; see VERDICT r1 / STATUS roadmap #1).
    """
    bs, q, _ = L.shape
    h = q // 4

    subs = jnp.concatenate([L[:, i * h:(i + 1) * h, i * h:(i + 1) * h]
                            for i in range(4)], axis=0)        # (4BS, h, h)
    Wd = _subst_invert(subs)
    W0, W1, W2, W3 = (Wd[i * bs:(i + 1) * bs] for i in range(4))

    W01 = _combine_lower_inv(W0, W1, L[:, h:2 * h, 0:h])
    W23 = _combine_lower_inv(W2, W3, L[:, 3 * h:4 * h, 2 * h:3 * h])
    return _combine_lower_inv(W01, W23, L[:, 2 * h:4 * h, 0:2 * h])


def _chol_small_xla(blk):
    """XLA-level base Cholesky of (BS, h, h) SPD blocks: the same rank-1
    column elimination as :func:`_chol_small` but with static slices and a
    broadcast outer product (no iota masks, no ones-matmul pivot
    replication — Mosaic-only workarounds).  Unrolls at trace time into a
    fully fusible VPU chain."""
    bs, q, _ = blk.shape
    dt = blk.dtype
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    a = blk
    cols = []                                      # cols[j]: (BS, q, 1)
    row_ge = [jnp.arange(q)[None, :, None] >= j for j in range(q)]
    for j in range(q):
        inv_piv = jax.lax.rsqrt(
            jnp.maximum(a[:, j:j + 1, j:j + 1], tiny))     # (BS, 1, 1)
        col = jnp.where(row_ge[j], a[:, :, j:j + 1] * inv_piv,
                        jnp.zeros((), dt))                 # (BS, q, 1)
        a = a - col * jnp.swapaxes(col, 1, 2)
        cols.append(col)
    return jnp.concatenate(cols, axis=2)


def _factor_block_twolevel(blk, h: int = 8, mosaic: bool = True):
    """Batched Cholesky of (BS, NB, NB) SPD blocks + factor inverse.

    Fully recursive divide-and-conquer (the name survives from the original
    two-level variant; ``h`` is now the recursion base width):

        L11, W11 = factor(A11)            W = [[ W11,        0  ],
        L21      = A21 @ W11^T                 [-W22 L21 W11, W22]]
        L22, W22 = factor(A22 - L21 L21^T)

    The sequential chain is NB dependent column steps no matter how the
    block is split (elimination is column-sequential at the base), but the
    PER-STEP cost is the base tile: recursing to h=8 cuts the masked VPU
    work of each step ~16x vs the old 32-wide two-level scheme (measured:
    the diag chain, not FLOPs or HBM, dominated the blocked factor), and
    every other operation — sub-TRSM, trailing syrk, trtri combines — is a
    batched MXU matmul.  inv(L) is co-computed by the same recursion, so no
    separate inversion pass exists at all.
    """
    bs, q, _ = blk.shape
    dt = blk.dtype
    if q <= h:
        if mosaic:
            L = _chol_small(blk)
            return L, _subst_invert_loop(L)
        L = _chol_small_xla(blk)
        return L, _subst_invert_xla(L)
    hh = q // 2
    L11, W11 = _factor_block_twolevel(blk[:, :hh, :hh], h, mosaic)
    L21 = _bmm(blk[:, hh:, :hh], jnp.swapaxes(W11, 1, 2))
    S = blk[:, hh:, hh:] - _bmm(L21, jnp.swapaxes(L21, 1, 2))
    L22, W22 = _factor_block_twolevel(S, h, mosaic)
    zer = jnp.zeros((bs, hh, q - hh), dt)
    L = jnp.concatenate([
        jnp.concatenate([L11, zer], axis=2),
        jnp.concatenate([L21, L22], axis=2)], axis=1)
    off = -_bmm(W22, _bmm(L21, W11))
    W = jnp.concatenate([
        jnp.concatenate([W11, zer], axis=2),
        jnp.concatenate([off, W22], axis=2)], axis=1)
    return L, W


def _chol_small(blk):
    """Batched Cholesky factor of (BS, h, h) SPD blocks.

    Column loop j = 0..h-1, VECTORIZED over the sub-batch — a sequential
    chain, so amortizing it across instances and keeping h small (the
    two-level scheme) is the throughput trick.  Each step is the rank-1
    right-looking elimination for L's column j; all indexing is via iota
    masks — Mosaic has no dynamic_slice on values, and (BS,1,1) layouts are
    unsupported, so the pivot is replicated across a row by a ones-matmul.
    """
    bs, q, _ = blk.shape
    dt = blk.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, q, q), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, q, q), 2)
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (1, q, 1), 1)
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    zero = jnp.zeros((), dt)
    ones = jnp.ones_like(blk)

    def body(j, carry):
        a, L = carry
        d_row = jnp.sum(jnp.where((rows == j) & (cols == j), a, zero),
                        axis=1, keepdims=True)
        ajj_row = jax.lax.dot_general(
            d_row, ones, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dt, precision=_HP)
        inv_piv_col = jnp.swapaxes(
            jax.lax.rsqrt(jnp.maximum(ajj_row, tiny)), 1, 2)
        col = jnp.sum(jnp.where(cols == j, a, zero), axis=2, keepdims=True)
        l = jnp.where(rows_c >= j, col * inv_piv_col, zero)
        a = a - l * jnp.swapaxes(l, 1, 2)
        L = jnp.where(cols == j, l, L)
        return a, L

    # unroll=8: the rank-1 elimination steps are tiny VPU fusions; letting
    # XLA fuse 8 dependent steps per launch cuts the sequential-launch
    # count of the diagonal chain (measured: the chain, not FLOPs or HBM,
    # dominates the blocked factor at m=1024)
    _, L = jax.lax.fori_loop(0, q, body, (blk, jnp.zeros_like(blk)),
                             unroll=8)
    return L


def _bmm(a, b):
    """Batched (BS, p, q) @ (BS, q, r) on the MXU, f32 accumulate."""
    return jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32,
                               precision=_HP)


def _cholesky_panel_kernel(m_hbm, l_hbm, w_hbm, S, T, D, w_d, w_s, sems,
                           *, m: int, B: int, BS: int, BSd: int):
    """Panel step k (grid dim 0) of the batched right-looking factorization.

    Everything lives in HBM; each panel step runs in TWO phases so the
    sequential diagonal factorization amortizes over many more instances
    than the VMEM-hungry stripe work allows:

    phase A (sub-batches of BSd, only the (BSd, NB, NB) diagonal blocks in
    VMEM): two-level blocked factor + trtri-style inverse
    (:func:`_factor_block_twolevel`) — the kernel's only sequential chains,
    now short steps on (BSd, 32, 32) sub-blocks; L_kk and inv(L_kk) are
    written back to HBM.

    phase B (sub-batches of BS, the full (BS, m, NB) column stripe in
    VMEM): panel TRSM as one batched MXU matmul against the phase-A
    inverses, then the trailing syrk tile-by-tile (static loop, predicated
    on tile > k).  m_hbm is the aliased input (same buffer as l_hbm):
    right-looking updates keep it current.
    """
    del m_hbm
    k = pl.program_id(0)
    o = pl.multiple_of(k * NB, NB)
    nblk = m // NB
    rows_m = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)

    def diag_batch(bd, _):
        b0 = pl.multiple_of(bd * BSd, BSd)
        ld = pltpu.make_async_copy(
            l_hbm.at[pl.ds(b0, BSd), pl.ds(o, NB), pl.ds(o, NB)], D,
            sems.at[0])
        ld.start()
        ld.wait()
        L_D, W_D = _factor_block_twolevel(D[:])
        D[:] = L_D
        w_d[:] = W_D
        st_l = pltpu.make_async_copy(
            D, l_hbm.at[pl.ds(b0, BSd), pl.ds(o, NB), pl.ds(o, NB)],
            sems.at[1])
        st_w = pltpu.make_async_copy(
            w_d, w_hbm.at[pl.ds(b0, BSd), k], sems.at[2])
        st_l.start()
        st_w.start()
        st_l.wait()
        st_w.wait()
        return 0

    jax.lax.fori_loop(0, B // BSd, diag_batch, 0)

    def sub_batch(bs, _):
        b0 = pl.multiple_of(bs * BS, BS)
        # --- load column stripe k (rows >= o hold updated M; the diagonal
        # block was replaced by L_kk in phase A) + the phase-A inverses ----
        ld = pltpu.make_async_copy(
            l_hbm.at[pl.ds(b0, BS), :, pl.ds(o, NB)], S, sems.at[0])
        ld_w = pltpu.make_async_copy(
            w_hbm.at[pl.ds(b0, BS), k], w_s, sems.at[1])
        ld.start()
        ld_w.start()
        ld.wait()
        ld_w.wait()
        W_D = w_s[:]
        # --- panel TRSM as one batched MXU matmul -------------------------
        # One single full-stripe write: below-diag rows get the TRSM result,
        # the diagonal rows keep L_kk (factored in phase A, present in the
        # loaded stripe), rows above are zeroed.  A dynamic-offset sub-tile
        # re-insert (S[:, pl.ds(o, NB), :] = L_D) after a full overwrite is
        # silently DROPPED by Mosaic (diag blocks came back zero on real TPU
        # while interpret mode passed) — never split this into two writes.
        below = rows_m >= o + NB                         # (1, m, 1)
        diag_rows = (rows_m >= o) & (rows_m < o + NB)
        Sv = S[:]
        P = _bmm(Sv, jnp.swapaxes(W_D, 1, 2))            # (BS, m, NB)
        S[:] = jnp.where(below, P, jnp.where(diag_rows, Sv, 0.0))
        st_l = pltpu.make_async_copy(
            S, l_hbm.at[pl.ds(b0, BS), :, pl.ds(o, NB)], sems.at[2])
        st_l.start()
        st_l.wait()
        # --- trailing syrk, tile by tile (static loop, predicated) --------
        for j in range(1, nblk):
            oj = j * NB

            @pl.when(j > k)
            def _():
                ldt = pltpu.make_async_copy(
                    l_hbm.at[pl.ds(b0, BS), :, oj:oj + NB], T, sems.at[0])
                ldt.start()
                ldt.wait()
                Lrow_j = S[:, oj:oj + NB, :]             # L[c,k] for tile j
                upd = _bmm(S[:], jnp.swapaxes(Lrow_j, 1, 2))
                T[:] = T[:] - jnp.where(below, upd, 0.0)
                stt = pltpu.make_async_copy(
                    T, l_hbm.at[pl.ds(b0, BS), :, oj:oj + NB], sems.at[2])
                stt.start()
                stt.wait()
        return 0

    jax.lax.fori_loop(0, B // BS, sub_batch, 0)


def _sub_batch_size(B: int, m: int) -> int:
    """Largest divisor of B with two (BS, m, NB) stripes under ~7MB VMEM
    (the diag-factor + inversion temporaries need the rest)."""
    cap = max(1, (7 << 20) // (2 * m * NB * 4))
    bs = 1
    for d in range(1, min(B, cap) + 1):
        if B % d == 0:
            bs = d
    return bs


def _diag_batch_size(B: int) -> int:
    """Largest divisor of B (capped) for the phase-A diagonal factorization:
    only (BSd, NB, NB) blocks live in VMEM, so the sequential column loops
    amortize over ~4x more instances than the stripe phase allows."""
    cap = 16
    bs = 1
    for d in range(1, min(B, cap) + 1):
        if B % d == 0:
            bs = d
    return bs


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cholesky_batched_impl(M: jax.Array, interpret: bool | None = None):
    if interpret is None:
        interpret = _interpret()
    B, m, m2 = M.shape
    assert m == m2 and m % NB == 0, f"m={m} must be a multiple of {NB}"
    nblk = m // NB
    BS = _sub_batch_size(B, m)
    BSd = _diag_batch_size(B)
    kernel = functools.partial(_cholesky_panel_kernel, m=m, B=B, BS=BS,
                               BSd=BSd)
    L, W = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, m), jnp.float32),
            jax.ShapeDtypeStruct((B, nblk, NB, NB), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BS, m, NB), jnp.float32),     # S: column stripe
            pltpu.VMEM((BS, m, NB), jnp.float32),     # T: trailing tile
            pltpu.VMEM((BSd, NB, NB), jnp.float32),   # D: diag blocks (ph. A)
            pltpu.VMEM((BSd, NB, NB), jnp.float32),   # w_d: W staging (ph. A)
            pltpu.VMEM((BS, NB, NB), jnp.float32),    # w_s: W reload (ph. B)
            pltpu.SemaphoreType.DMA((3,)),
        ],
        input_output_aliases={0: 0},   # factor in place: M buffer becomes L
        interpret=interpret,
    )(M.astype(jnp.float32))
    return L, W


@jax.custom_batching.custom_vmap
def cholesky_batched(M: jax.Array):
    """Batched Cholesky: M (B, m, m) SPD -> (L (B, m, m), W (B, m/NB, NB, NB)).

    ``W`` holds inv(L_kk) for each diagonal block — consumed by
    :func:`solve_triangular_batched` to turn triangular solves into matmuls.
    m must be a multiple of 128 (pad upstream; ipx/linsys/normal_eq.py does).
    vmap-ing this function collapses the mapped axis into the kernel's batch
    axis (custom_vmap below) instead of adding a pallas grid dimension.
    """
    return _cholesky_batched_impl(M)


@cholesky_batched.def_vmap
def _cholesky_batched_vmap(axis_size, in_batched, M):
    (mb,) = in_batched
    if not mb:
        M = jnp.broadcast_to(M[None], (axis_size, *M.shape))
    V, B = M.shape[0], M.shape[1]
    L, W = cholesky_batched(M.reshape(V * B, *M.shape[2:]))
    return ((L.reshape(V, B, *L.shape[1:]), W.reshape(V, B, *W.shape[1:])),
            (True, True))


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


def _bmv2(a, v):
    """Batched matrix @ vector with 2D vectors: (BC, p, q) x (BC, q) ->
    (BC, p) — keeps all vector buffers 2D (Mosaic cannot slice the padded
    last dim of (BC, m, 1) layouts)."""
    return jax.lax.dot_general(a, v, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32,
                               precision=_HP)


def _solve_pair_lt_kernel(lt_hbm, w_hbm, b_hbm, x_hbm, S, Wb, rv, xv,
                          sems, *, m: int, B: int, BC: int):
    """Fused L y = b; L^T x = y reading ONLY the transposed factor LT.

    Both sweeps consume the SAME strict-suffix row stripes
    ``LT[o:o+NB, o+NB:]``: the forward solve is RIGHT-LOOKING — after
    y_k = W_k r_k the residual suffix is updated through the stripe,
    ``r[o+NB:] -= stripe^T y_k`` (a batched row-vector matmul) — and
    the backward solve is the usual left-looking substitution with
    last-dim contraction.  One stored layout means the factor writes half
    the bytes and no (B, m, m) transpose is ever materialized (the L+LT
    predecessor of this kernel transposed L inside every call).

    Per sub-chunk of BC instances the rhs/solution vectors live in VMEM;
    each block step DMAs one fixed-width (BC, NB, m) stripe and applies
    BATCHED MXU dots across the chunk.  Triangular structure comes from
    iota masks on the full-width stripes (stale prefix columns from the
    previous, longer suffix loads are masked to zero).
    """
    nblk = m // NB
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    for c in range(B // BC):
        b0 = c * BC
        ld_b = pltpu.make_async_copy(b_hbm.at[b0:b0 + BC], rv, sems.at[2])
        ld_b.start()
        ld_b.wait()
        # forward: right-looking L y = b — rv morphs r -> y block by block
        for k in range(nblk):
            o = k * NB
            ld_w = pltpu.make_async_copy(
                w_hbm.at[b0:b0 + BC, k], Wb, sems.at[1])
            ld_w.start()
            if o + NB < m:
                # stripe DMA overlaps the W wait + the y_k dot below
                ld_s = pltpu.make_async_copy(
                    lt_hbm.at[b0:b0 + BC, o:o + NB, o + NB:],
                    S.at[:, :, o + NB:], sems.at[0])
                ld_s.start()
            ld_w.wait()
            yk = _bmv2(Wb[:], rv[:, o:o + NB])               # (BC, NB)
            rv[:, o:o + NB] = yk
            if o + NB < m:
                ld_s.wait()
                masked = jnp.where(cols_r >= o + NB, S[:], 0.0)
                # upd = stripe^T y_k as a batched row-vector @ matrix
                # matmul: Mosaic rejects the direct dim-1 contraction
                # with a vector rhs (benchmarks/probe_dim1_dot.py form A)
                # but accepts this shape (form B, verified on real TPU)
                upd = jax.lax.dot_general(
                    yk[:, None, :], masked, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=_HP)[:, 0, :]
                # prefix entries of upd are masked-zero: subtracting over
                # the full width leaves the already-final y blocks intact
                rv[:] = rv[:] - upd
        # backward: L^T x = y via the same strict-suffix stripes
        xv[:] = jnp.zeros((BC, m), jnp.float32)
        for k in range(nblk - 1, -1, -1):
            o = k * NB
            ld_w = pltpu.make_async_copy(
                w_hbm.at[b0:b0 + BC, k], Wb, sems.at[1])
            ld_w.start()
            if o + NB < m:
                ld_s = pltpu.make_async_copy(
                    lt_hbm.at[b0:b0 + BC, o:o + NB, o + NB:],
                    S.at[:, :, o + NB:], sems.at[0])
                ld_s.start()
                ld_s.wait()
            ld_w.wait()
            if o + NB < m:
                masked = jnp.where(cols_r >= o + NB, S[:], 0.0)
                r = rv[:, o:o + NB] - _bmv2(masked, xv[:])
            else:
                r = rv[:, o:o + NB]
            WbT = jnp.swapaxes(Wb[:], 1, 2)
            xv[:, o:o + NB] = _bmv2(WbT, r)                # W^T r
        st_x = pltpu.make_async_copy(xv, x_hbm.at[b0:b0 + BC], sems.at[2])
        st_x.start()
        st_x.wait()


def _solve_chunk(B: int, m: int) -> int:
    """Largest power-of-two divisor of B with the (BC, NB, m) stripe under
    ~8MB VMEM (power-of-two for the same Mosaic sublane-tile alignment as
    :func:`_solve_chunk_db`, and so the pipelined/non-pipelined kernels
    chunk identically — their bitwise-equality pin depends on it)."""
    cap = max(1, (8 << 20) // (NB * m * 4))
    bc = 1
    for d in range(1, min(B, cap) + 1):
        if B % d == 0 and (d & (d - 1)) == 0:
            bc = d
    return bc


def _solve_pair_lt_kernel_db(lt_hbm, w_hbm, b_hbm, x_hbm, S0, S1, W0, W1,
                             rv0, rv1, xv, sems, *, m: int, B: int, BC: int):
    """Pipelined variant of :func:`_solve_pair_lt_kernel`: same algebra,
    but every HBM load is DEPTH-1 PREFETCHED into rolling 2-slot buffers.

    The non-pipelined kernel is latency-bound, not bandwidth-bound: each of
    the 2*(nblk-1) stripe DMAs per chunk is started and then immediately
    waited on, so the DMA engine idles between steps (measured ~3x off the
    pair-solve's HBM floor; shrinking the stripes 22% only bought 7%).
    Here stripe/W loads for block step k+1 are issued before step k's
    compute, so one DMA is always in flight:

    - stripe(k) lives in slot k%2, W(k) in wslot k%2 — the natural rolling
      assignment makes every prefetch target the buffer freed two steps ago;
    - the backward sweep REUSES the still-resident stripe(nblk-2) and the
      last two W blocks from the forward sweep (same chunk, same data) and
      keeps prefetching downward, so the pipeline never drains at the sweep
      boundary — its W(k-2) prefetch is issued AFTER step k's compute (its
      target wslot k%2 is read by that compute);
    - at the chunk boundary the next chunk's b (into the parity-alternating
      rv slot), W(0) and stripe(0) are issued during the current tail, and
      the x store is only waited one chunk later, just before xv is reused.

    Hazard rule used throughout: a DMA into a buffer is issued only at a
    program point AFTER the last compute that reads the buffer's previous
    contents (Mosaic orders the issue against prior vector ops).
    """
    nblk = m // NB
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    Sb = (S0, S1)
    Wb = (W0, W1)
    rvb = (rv0, rv1)
    nchunks = B // BC
    cps = {}

    def start_s(c, k):
        o = k * NB
        cp = pltpu.make_async_copy(
            lt_hbm.at[c * BC:(c + 1) * BC, o:o + NB, o + NB:],
            Sb[k % 2].at[:, :, o + NB:], sems.at[k % 2])
        cp.start()
        cps[("s", c, k)] = cp

    def start_w(c, k):
        cp = pltpu.make_async_copy(
            w_hbm.at[c * BC:(c + 1) * BC, k], Wb[k % 2], sems.at[2 + k % 2])
        cp.start()
        cps[("w", c, k)] = cp

    def start_b(c):
        cp = pltpu.make_async_copy(
            b_hbm.at[c * BC:(c + 1) * BC], rvb[c % 2], sems.at[4 + c % 2])
        cp.start()
        cps[("b", c)] = cp

    def start_x(c):
        cp = pltpu.make_async_copy(
            xv, x_hbm.at[c * BC:(c + 1) * BC], sems.at[6])
        cp.start()
        cps[("x", c)] = cp

    def wait(*key):
        cps.pop(key).wait()

    # prologue: chunk 0's b, W(0), stripe(0)
    start_b(0)
    start_w(0, 0)
    if nblk > 1:
        start_s(0, 0)

    for c in range(nchunks):
        rv = rvb[c % 2]
        wait("b", c)
        # ---- forward: right-looking L y = b (rv morphs r -> y) ------------
        for k in range(nblk):
            o = k * NB
            if k + 1 < nblk:
                start_w(c, k + 1)
                if k + 1 < nblk - 1:
                    start_s(c, k + 1)
            wait("w", c, k)
            yk = _bmv2(Wb[k % 2][:], rv[:, o:o + NB])        # (BC, NB)
            rv[:, o:o + NB] = yk
            if k < nblk - 1:
                wait("s", c, k)
                masked = jnp.where(cols_r >= o + NB, Sb[k % 2][:], 0.0)
                # batched row-vector @ matrix (Mosaic rejects the direct
                # dim-1 contraction; see the non-pipelined kernel)
                upd = jax.lax.dot_general(
                    yk[:, None, :], masked, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=_HP)[:, 0, :]
                rv[:] = rv[:] - upd
        # ---- backward: L^T x = y via the same strict-suffix stripes -------
        # Resident from the forward sweep: stripe(nblk-2), W(nblk-1),
        # W(nblk-2) — their copy objects were already waited there.
        if c + 1 < nchunks:
            start_b(c + 1)
        if c > 0:
            wait("x", c - 1)
        xv[:] = jnp.zeros((BC, m), jnp.float32)
        for k in range(nblk - 1, -1, -1):
            o = k * NB
            if 0 <= k - 1 <= nblk - 3:
                start_s(c, k - 1)        # slot (k-1)%2: read at step k+1
            if k <= nblk - 2:
                if k < nblk - 2:
                    wait("s", c, k)
                masked = jnp.where(cols_r >= o + NB, Sb[k % 2][:], 0.0)
                r = rv[:, o:o + NB] - _bmv2(masked, xv[:])
            else:
                r = rv[:, o:o + NB]
            if k < nblk - 2:
                wait("w", c, k)
            WbT = jnp.swapaxes(Wb[k % 2][:], 1, 2)
            xv[:, o:o + NB] = _bmv2(WbT, r)                  # W^T r
            if k - 2 >= 0:
                start_w(c, k - 2)        # wslot k%2: freed by THIS compute
        start_x(c)
        if c + 1 < nchunks:
            start_w(c + 1, 0)            # wslot 0: freed by backward step 0
            if nblk > 1:
                start_s(c + 1, 0)
    wait("x", nchunks - 1)


def _solve_chunk_db(B: int, m: int) -> int:
    """Largest divisor of B whose DOUBLE-buffered pair-solve working set
    (two (BC, NB, m) stripes + two W slots + 3 vector buffers) fits ~9.5MB
    of VMEM.  The budget counts SCRATCH only: Mosaic's compiler temporaries
    (the masked-stripe select and dot operands, up to ~one more (BC, NB, m)
    stripe, +0.5MB/instance at m=1024) come out of the remaining ~6.5MB —
    measured headroom at BC=8, m=1024 on the real chip, NOT slack in this
    estimate (ADVICE r2 #4).  Raise the budget only with a re-measure."""
    per = 2 * NB * m * 4 + 2 * NB * NB * 4 + 3 * m * 4
    cap = max(1, ((9 << 20) + (1 << 19)) // per)
    bc = 1
    for d in range(1, min(B, cap) + 1):
        # POWER-OF-TWO divisors only: Mosaic rounds a (BC, m) VMEM scratch
        # allocation up to the sublane tile (4 for f32), so a non-power-of-
        # two BC (e.g. 3, from an odd rescue sub-batch) makes every full-ref
        # read a misaligned memref slice — real-chip compile error "Slice
        # shape along dimension 0 must be aligned to tiling (4), but is 3".
        # Callers additionally pad B (see _pad_batch_pow2) so an aligned
        # divisor always exists.
        if B % d == 0 and (d & (d - 1)) == 0:
            bc = d
    return bc


def _pad_batch_pow2(B: int) -> int:
    """Batch padding target for the Mosaic pair-solve kernels: next power
    of two below 8, next multiple of 8 above — every divisor chain the
    chunk pickers produce is then a power of two (sublane-tile aligned)."""
    if B < 8:
        p = 1
        while p < B:
            p <<= 1
        return p
    return -(-B // 8) * 8


# Production default for the pair-solve kernel: pipelined double-buffered
# stripe DMA (A/B'd against the start-wait kernel).  Diagnosis flips must
# happen BEFORE the first traced call of an enclosing jit (the flag is read
# at trace time, never at run time); `chol_solve_batched_lt` resolves it
# outside the inner jit so a flip at least invalidates nothing silently
# within a fresh trace (ADVICE r2 #1).
PAIR_SOLVE_PIPELINE = True


@functools.partial(jax.jit, static_argnames=("interpret", "pipeline"))
def _chol_solve_pair_lt_impl(LT, W, b, interpret: bool | None = None,
                             pipeline: bool | None = None):
    if interpret is None:
        interpret = _interpret()
    if pipeline is None:
        pipeline = PAIR_SOLVE_PIPELINE
    B, m, _ = LT.shape
    if pipeline:
        BC = _solve_chunk_db(B, m)
        kernel = functools.partial(_solve_pair_lt_kernel_db, m=m, B=B, BC=BC)
        scratch = [
            pltpu.VMEM((BC, NB, m), jnp.float32),    # S0: stripe slot 0
            pltpu.VMEM((BC, NB, m), jnp.float32),    # S1: stripe slot 1
            pltpu.VMEM((BC, NB, NB), jnp.float32),   # W0: diag-inv slot 0
            pltpu.VMEM((BC, NB, NB), jnp.float32),   # W1: diag-inv slot 1
            pltpu.VMEM((BC, m), jnp.float32),        # rv0: rhs/y (even chunks)
            pltpu.VMEM((BC, m), jnp.float32),        # rv1: rhs/y (odd chunks)
            pltpu.VMEM((BC, m), jnp.float32),        # xv: final result
            pltpu.SemaphoreType.DMA((7,)),
        ]
    else:
        BC = _solve_chunk(B, m)
        kernel = functools.partial(_solve_pair_lt_kernel, m=m, B=B, BC=BC)
        scratch = [
            pltpu.VMEM((BC, NB, m), jnp.float32),    # S: stripe (both sweeps)
            pltpu.VMEM((BC, NB, NB), jnp.float32),   # Wb: diag-block inverses
            pltpu.VMEM((BC, m), jnp.float32),        # rv: rhs -> forward y
            pltpu.VMEM((BC, m), jnp.float32),        # xv: final result
            pltpu.SemaphoreType.DMA((3,)),
        ]
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, m), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(LT, W, b.astype(jnp.float32))


@jax.custom_batching.custom_vmap
def chol_solve_batched_lt(LT, W, b):
    """Solve (L L^T) x = b given the TRANSPOSED batched factor LT = L^T.

    The production entry point: the factor layer stores only LT (see
    normal_eq.factor), so no transpose is ever materialized.  vmap
    collapses into the kernel batch axis (custom_vmap), so batched solvers
    get grid-level batching instead of a pallas vmap dimension."""
    # pipeline resolved HERE (outside the inner jit) so the module flag is
    # honored per-trace instead of being baked into the first compile's
    # default-argument cache entry (ADVICE r2 #1)
    B = LT.shape[0]
    Bp = _pad_batch_pow2(B)
    if Bp != B:
        # zero-padded instances are algebraically inert (the kernel is pure
        # matmuls against precomputed inverses — no divisions), and the
        # sublane-tile alignment they buy is REQUIRED on real Mosaic: odd
        # sub-batches (rescue-ladder subsets) otherwise fail to compile.
        pad = Bp - B
        LT, W, b = (jnp.concatenate(
            [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], axis=0)
            for a in (LT, W, b))
    x = _chol_solve_pair_lt_impl(LT, W, b, interpret=_interpret(),
                                 pipeline=PAIR_SOLVE_PIPELINE)
    return x[:B] if Bp != B else x


@chol_solve_batched_lt.def_vmap
def _chol_solve_batched_lt_vmap(axis_size, in_batched, LT, W, b):
    ops = [LT, W, b]
    ops = [o if bt else jnp.broadcast_to(o[None], (axis_size, *o.shape))
           for o, bt in zip(ops, in_batched)]
    LT, W, b = ops
    V, B = LT.shape[0], LT.shape[1]
    x = chol_solve_batched_lt(LT.reshape(V * B, *LT.shape[2:]),
                              W.reshape(V * B, *W.shape[2:]),
                              b.reshape(V * B, *b.shape[2:]))
    return x.reshape(V, B, *x.shape[1:]), True


def chol_solve_batched(L, W, b):
    """Solve (L L^T) x = b from the UNtransposed factor (compatibility
    wrapper: transposes L once, then runs the LT kernel).  Production
    callers hold LT already and use :func:`chol_solve_batched_lt`."""
    return chol_solve_batched_lt(jnp.swapaxes(L, -1, -2), W, b)


def _factor_lt_kernel(ms_hbm, lt_hbm, w_hbm, C0, C1, P0, P1, Wst, sems,
                      *, m: int, BF: int):
    """LEFT-looking batched Cholesky emitting the TRANSPOSED factor LT.

    The round-2 production factor (normal_eq._blocked_potrf_left) has the
    right algorithm but runs at the XLA level, where its measured cost is
    materialization traffic (every dynamic_update_slice / operand staging
    round-trips the (B, m, m) buffer through HBM) — ~10x off the factor's
    true HBM floor.  This kernel keeps the CURRENT row panel resident in
    VMEM and touches HBM exactly once per datum:

      panel k (o = k*NB), transposed layout throughout:
        C  = M[o:o+NB, o:]  -  sum_{j<k} LT[jNB:(j+1)NB, o:o+NB]^T
                                         @ LT[jNB:(j+1)NB, o:]
        L_kk, W_kk = factor(C[:, :NB])        (diag block, batched)
        LT[o:o+NB, :] = [0, L_kk^T, W_kk @ C[:, NB:]]

    Streaming structure per batch chunk of BF instances:
      * prior panels j <= k-2 are DMA'd from the already-written LT with
        DEPTH-1 prefetch into rolling slots P0/P1 (one stripe always in
        flight, as in the pair-solve kernel);
      * the accumulator PING-PONGS between C0/C1, so panel k-1's finished
        value is still resident when panel k consumes it — the largest
        single contribution (suffix width m-o) never round-trips HBM, and
        panel k-1's LT store overlaps panel k's compute (its buffer is only
        rewritten at panel k+1, after an explicit wait);
      * every value slice is static (k, j, o are Python-loop constants) and
        suffix-aligned to the fresh DMA region, so no iota masking is
        needed anywhere — stale prefix columns are simply never read.

    Per-instance HBM traffic at m=1024: M suffix reads 2.25MB + streamed
    priors 3.7MB + LT writes 4MB + W 0.6MB ~= 10.5MB — vs the ~45MB/inst
    of the right-looking Mosaic kernel's trailing updates and the XLA
    factor's materialization multiples of m^2.
    """
    nblk = m // NB
    b0 = pl.multiple_of(pl.program_id(0) * BF, BF)
    Cb = (C0, C1)
    Pb = (P0, P1)
    cps = {}

    def start_p(j, o):
        # prior LT row panel j, suffix columns [o:] (the only part panel k
        # reads); lands in the rolling slot j%2
        cp = pltpu.make_async_copy(
            lt_hbm.at[pl.ds(b0, BF), j * NB:(j + 1) * NB, o:],
            Pb[j % 2].at[:, :, o:], sems.at[j % 2])
        cp.start()
        cps[("p", j)] = cp

    for k in range(nblk):
        o = k * NB
        Ck = Cb[k % 2]
        if k >= 2:
            # Ck still feeds panel k-2's LT store: wait before overwriting
            cps.pop(("l", k - 2)).wait()
        cp_m = pltpu.make_async_copy(
            ms_hbm.at[pl.ds(b0, BF), o:o + NB, o:], Ck.at[:, :, o:],
            sems.at[2])
        cp_m.start()
        if k >= 2:
            start_p(0, o)
        cp_m.wait()
        # --- streamed prior panels j = 0 .. k-2 (depth-1 prefetch) --------
        for j in range(k - 1):
            if j + 1 < k - 1:
                start_p(j + 1, o)
            cps.pop(("p", j)).wait()
            Pj = Pb[j % 2]
            upd = _bmm(jnp.swapaxes(Pj[:, :, o:o + NB], 1, 2), Pj[:, :, o:])
            Ck[:, :, o:] = Ck[:, :, o:] - upd
        # --- panel k-1 directly from its resident accumulator -------------
        if k >= 1:
            Cp = Cb[(k - 1) % 2]
            upd = _bmm(jnp.swapaxes(Cp[:, :, o:o + NB], 1, 2), Cp[:, :, o:])
            Ck[:, :, o:] = Ck[:, :, o:] - upd
        # --- diagonal factor + inverse (batched over the chunk) -----------
        L_D, W_D = _factor_block_twolevel(Ck[:, :, o:o + NB])
        Wst[:] = W_D
        cp_w = pltpu.make_async_copy(Wst, w_hbm.at[pl.ds(b0, BF), k],
                                     sems.at[3])
        cp_w.start()
        # --- panel TRSM-as-matmul + final full-width compose ---------------
        if o + NB < m:
            Ck[:, :, o + NB:] = _bmm(W_D, Ck[:, :, o + NB:])
        Ck[:, :, o:o + NB] = jnp.swapaxes(L_D, 1, 2)
        if o > 0:
            Ck[:, :, :o] = jnp.zeros((BF, NB, o), jnp.float32)
        cp_l = pltpu.make_async_copy(
            Ck, lt_hbm.at[pl.ds(b0, BF), o:o + NB, :], sems.at[4 + k % 2])
        cp_l.start()                 # waited at panel k+2 (buffer reuse)
        cps[("l", k)] = cp_l
        cp_w.wait()
    # drain the last two LT stores before the next grid step reuses C0/C1
    for k in (nblk - 2, nblk - 1):
        if k >= 0:
            cps.pop(("l", k)).wait()


def _factor_chunk(B: int, m: int) -> int:
    """Largest divisor of B whose factor working set (4 (BF, NB, m) stripes
    + W staging + ~one stripe of dot/diag temporaries) fits ~11MB VMEM."""
    per = 4 * NB * m * 4 + NB * NB * 4
    cap = max(1, (11 << 20) // int(per * 1.3))
    bf = 1
    for d in range(1, min(B, cap) + 1):
        if B % d == 0:
            bf = d
    return bf


@functools.partial(jax.jit, static_argnames=("interpret",))
def _factor_lt_impl(M: jax.Array, interpret: bool | None = None):
    if interpret is None:
        interpret = _interpret()
    B, m, m2 = M.shape
    assert m == m2 and m % NB == 0, f"m={m} must be a multiple of {NB}"
    nblk = m // NB
    BF = _factor_chunk(B, m)
    kernel = functools.partial(_factor_lt_kernel, m=m, BF=BF)
    LT, W = pl.pallas_call(
        kernel,
        grid=(B // BF,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, m), jnp.float32),
            jax.ShapeDtypeStruct((B, nblk, NB, NB), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BF, NB, m), jnp.float32),     # C0: accumulator (even)
            pltpu.VMEM((BF, NB, m), jnp.float32),     # C1: accumulator (odd)
            pltpu.VMEM((BF, NB, m), jnp.float32),     # P0: stream slot 0
            pltpu.VMEM((BF, NB, m), jnp.float32),     # P1: stream slot 1
            pltpu.VMEM((BF, NB, NB), jnp.float32),    # Wst: W staging
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(M.astype(jnp.float32))
    return LT, W


@jax.custom_batching.custom_vmap
def factor_lt_batched(M: jax.Array):
    """Batched Cholesky, TRANSPOSED output: M (B, m, m) SPD ->
    (LT (B, m, m) upper-triangular = L^T, W (B, m/NB, NB, NB) diag-block
    inverses) — exactly the layout :func:`chol_solve_batched_lt` consumes,
    with no transpose materialized anywhere.  m must be a multiple of 128
    (pad upstream; ipx/linsys/normal_eq.py does).  vmap collapses the
    mapped axis into the kernel batch axis."""
    return _factor_lt_impl(M)


@factor_lt_batched.def_vmap
def _factor_lt_batched_vmap(axis_size, in_batched, M):
    (mb,) = in_batched
    if not mb:
        M = jnp.broadcast_to(M[None], (axis_size, *M.shape))
    V, B = M.shape[0], M.shape[1]
    LT, W = factor_lt_batched(M.reshape(V * B, *M.shape[2:]))
    return ((LT.reshape(V, B, *LT.shape[1:]), W.reshape(V, B, *W.shape[1:])),
            (True, True))


# ---------------------------------------------------------------------------
# Panel-major factor: Mosaic accumulation kernels + XLA diagonal chains.
#
# Measured on the real chip (benchmarks/probe_diag_chain.py + the r3 stage
# ledger): the monolithic left-looking kernel above is dominated by the
# SEQUENTIAL diagonal-factor chain, which it runs once per (panel, chunk) —
# at BF=4 that is 512 chains/factor at ~110us each (~55ms of its 65ms),
# while the same chain amortized over the FULL batch at the XLA level costs
# <~1ms per panel.  The fix is architectural: put each phase where it is
# cheap.
#
#   per panel k (python loop at the XLA level):
#     C_k = accum kernel(Ms, panels[0..k-1])   Mosaic: stream-subtract prior
#                                              panels, VMEM-resident C,
#                                              depth-1 stripe prefetch
#     L_k, W_k = _factor_block_twolevel(C_k[:, :, :NB], mosaic=False)
#                                              XLA: ONE chain for all B
#     panels[k] = [L_k^T | W_k @ C_k[:, :, NB:]]    XLA batched MXU matmul
#
# Panels are SUFFIX-ONLY arrays (B, NB, m - k*NB) — no (B, m, m) buffer
# exists anywhere, no dynamic_update_slice, and total factor storage/traffic
# halves to sum_k NB*(m-o) = m(m+NB)/2.  The pair-solve kernel below reads
# the same strict-suffix stripes directly from the panel tuple.
# ---------------------------------------------------------------------------


def _accum_panel_kernel(*refs, m: int, k: int, BF: int):
    """Accumulate panel k's Schur row block over a batch chunk.

        C = Ms[o:o+NB, o:] - sum_{j<k} P_j[:, o-j*NB : o-j*NB+NB]^T
                                       @ P_j[:, o-j*NB:]

    refs = (ms_hbm, p_hbm[0..k-1], c_hbm, C, P0, P1, sems); all panel
    operands are suffix-only row panels; every slice is static and aligned
    to the fresh DMA region, so no masking is needed.  Prior panels stream
    with depth-1 prefetch into rolling slots.
    """
    ms_hbm = refs[0]
    p_hbm = refs[1:1 + k]
    c_hbm = refs[1 + k]
    C, P0, P1, sems = refs[2 + k:]
    o = k * NB
    w = m - o                      # this panel's suffix width
    b0 = pl.multiple_of(pl.program_id(0) * BF, BF)
    Pb = (P0, P1)
    cps = {}

    def start_p(j):
        # prior panel j's columns for [o:], i.e. its local suffix [o-j*NB:]
        cp = pltpu.make_async_copy(
            p_hbm[j].at[pl.ds(b0, BF), :, o - j * NB:],
            Pb[j % 2].at[:, :, :], sems.at[j % 2])
        cp.start()
        cps[j] = cp

    ld_m = pltpu.make_async_copy(
        ms_hbm.at[pl.ds(b0, BF), o:o + NB, o:], C, sems.at[2])
    ld_m.start()
    if k > 0:
        start_p(0)
    ld_m.wait()
    for j in range(k):
        if j + 1 < k:
            start_p(j + 1)
        cps.pop(j).wait()
        Pj = Pb[j % 2]
        upd = _bmm(jnp.swapaxes(Pj[:, :, :NB], 1, 2), Pj[:])
        C[:] = C[:] - upd
    st = pltpu.make_async_copy(C, c_hbm.at[pl.ds(b0, BF)], sems.at[2])
    st.start()
    st.wait()


def _accum_chunk(B: int, m: int, w: int) -> int:
    """Largest divisor of B with 3 (BF, NB, w) stripes + one dot temporary
    under ~11MB VMEM — narrower (later) panels get bigger chunks."""
    per = 4 * NB * w * 4
    cap = max(1, (11 << 20) // per)
    bf = 1
    for d in range(1, min(B, cap) + 1):
        if B % d == 0:
            bf = d
    return bf


def _accum_panel(Ms: jax.Array, panels: tuple, k: int):
    """pallas_call wrapper for :func:`_accum_panel_kernel` (batched)."""
    B, m, _ = Ms.shape
    o = k * NB
    w = m - o
    BF = _accum_chunk(B, m, w)
    kernel = functools.partial(_accum_panel_kernel, m=m, k=k, BF=BF)
    return pl.pallas_call(
        kernel,
        grid=(B // BF,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 + k),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, NB, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BF, NB, w), jnp.float32),     # C accumulator
            pltpu.VMEM((BF, NB, w), jnp.float32),     # P0 stream slot
            pltpu.VMEM((BF, NB, w), jnp.float32),     # P1 stream slot
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=_interpret(),
    )(Ms, *panels)


@jax.custom_batching.custom_vmap
def factor_lt_panels(M: jax.Array):
    """Panel-major batched Cholesky: M (B, m, m) SPD ->
    (panels, W) with panels a TUPLE of suffix-only transposed row panels
    (panels[k]: (B, NB, m - k*NB), rows o..o+NB of L^T from the diagonal
    on) and W (B, m/NB, NB, NB) the diag-block inverses.  Consumed by
    :func:`chol_solve_batched_panels`.  vmap collapses into the batch axis.
    """
    B, m, m2 = M.shape
    assert m == m2 and m % NB == 0, f"m={m} must be a multiple of {NB}"
    nblk = m // NB
    M = M.astype(jnp.float32)
    panels = []
    ws = []
    for k in range(nblk):
        o = k * NB
        if k == 0:
            C = M[:, :NB, :]
        else:
            C = _accum_panel(M, tuple(panels), k)
        L_D, W_D = _factor_block_twolevel(C[:, :, :NB], mosaic=False)
        ws.append(W_D)
        LdT = jnp.swapaxes(L_D, 1, 2)
        if o + NB < m:
            Pt = _bmm(W_D, C[:, :, NB:])
            panels.append(jnp.concatenate([LdT, Pt], axis=2))
        else:
            panels.append(LdT)
    return tuple(panels), jnp.stack(ws, axis=1)


@factor_lt_panels.def_vmap
def _factor_lt_panels_vmap(axis_size, in_batched, M):
    (mb,) = in_batched
    if not mb:
        M = jnp.broadcast_to(M[None], (axis_size, *M.shape))
    V, B = M.shape[0], M.shape[1]
    panels, W = factor_lt_panels(M.reshape(V * B, *M.shape[2:]))
    panels = tuple(p.reshape(V, B, *p.shape[1:]) for p in panels)
    W = W.reshape(V, B, *W.shape[1:])
    return ((panels, W),
            (tuple(True for _ in panels), True))


def _solve_pair_panels_kernel(*refs, m: int, B: int, BC: int):
    """The pipelined fused pair-solve (see :func:`_solve_pair_lt_kernel_db`)
    reading its strict-suffix stripes from the SUFFIX-ONLY panel tuple of
    :func:`factor_lt_panels` instead of a (B, m, m) LT buffer.  Identical
    schedule and algebra; only the stripe DMA source indexing differs
    (panel k's strict suffix is its local columns [NB:])."""
    p_hbm = refs[:m // NB]
    w_hbm, b_hbm, x_hbm, S0, S1, W0, W1, rv0, rv1, xv, sems = refs[m // NB:]
    nblk = m // NB
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    Sb = (S0, S1)
    Wb = (W0, W1)
    rvb = (rv0, rv1)
    nchunks = B // BC
    cps = {}

    def start_s(c, k):
        o = k * NB
        cp = pltpu.make_async_copy(
            p_hbm[k].at[c * BC:(c + 1) * BC, :, NB:],
            Sb[k % 2].at[:, :, o + NB:], sems.at[k % 2])
        cp.start()
        cps[("s", c, k)] = cp

    def start_w(c, k):
        cp = pltpu.make_async_copy(
            w_hbm.at[c * BC:(c + 1) * BC, k], Wb[k % 2], sems.at[2 + k % 2])
        cp.start()
        cps[("w", c, k)] = cp

    def start_b(c):
        cp = pltpu.make_async_copy(
            b_hbm.at[c * BC:(c + 1) * BC], rvb[c % 2], sems.at[4 + c % 2])
        cp.start()
        cps[("b", c)] = cp

    def start_x(c):
        cp = pltpu.make_async_copy(
            xv, x_hbm.at[c * BC:(c + 1) * BC], sems.at[6])
        cp.start()
        cps[("x", c)] = cp

    def wait(*key):
        cps.pop(key).wait()

    start_b(0)
    start_w(0, 0)
    if nblk > 1:
        start_s(0, 0)

    for c in range(nchunks):
        rv = rvb[c % 2]
        wait("b", c)
        for k in range(nblk):
            o = k * NB
            if k + 1 < nblk:
                start_w(c, k + 1)
                if k + 1 < nblk - 1:
                    start_s(c, k + 1)
            wait("w", c, k)
            yk = _bmv2(Wb[k % 2][:], rv[:, o:o + NB])
            rv[:, o:o + NB] = yk
            if k < nblk - 1:
                wait("s", c, k)
                masked = jnp.where(cols_r >= o + NB, Sb[k % 2][:], 0.0)
                upd = jax.lax.dot_general(
                    yk[:, None, :], masked, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=_HP)[:, 0, :]
                rv[:] = rv[:] - upd
        if c + 1 < nchunks:
            start_b(c + 1)
        if c > 0:
            wait("x", c - 1)
        xv[:] = jnp.zeros((BC, m), jnp.float32)
        for k in range(nblk - 1, -1, -1):
            o = k * NB
            if 0 <= k - 1 <= nblk - 3:
                start_s(c, k - 1)
            if k <= nblk - 2:
                if k < nblk - 2:
                    wait("s", c, k)
                masked = jnp.where(cols_r >= o + NB, Sb[k % 2][:], 0.0)
                r = rv[:, o:o + NB] - _bmv2(masked, xv[:])
            else:
                r = rv[:, o:o + NB]
            if k < nblk - 2:
                wait("w", c, k)
            WbT = jnp.swapaxes(Wb[k % 2][:], 1, 2)
            xv[:, o:o + NB] = _bmv2(WbT, r)
            if k - 2 >= 0:
                start_w(c, k - 2)
        start_x(c)
        if c + 1 < nchunks:
            start_w(c + 1, 0)
            if nblk > 1:
                start_s(c + 1, 0)
    wait("x", nchunks - 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_solve_panels_impl(panels, W, b, interpret: bool | None = None):
    if interpret is None:
        interpret = _interpret()
    B, _, m = panels[0].shape
    BC = _solve_chunk_db(B, m)
    kernel = functools.partial(_solve_pair_panels_kernel, m=m, B=B, BC=BC)
    scratch = [
        pltpu.VMEM((BC, NB, m), jnp.float32),    # S0
        pltpu.VMEM((BC, NB, m), jnp.float32),    # S1
        pltpu.VMEM((BC, NB, NB), jnp.float32),   # W0
        pltpu.VMEM((BC, NB, NB), jnp.float32),   # W1
        pltpu.VMEM((BC, m), jnp.float32),        # rv0
        pltpu.VMEM((BC, m), jnp.float32),        # rv1
        pltpu.VMEM((BC, m), jnp.float32),        # xv
        pltpu.SemaphoreType.DMA((7,)),
    ]
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (len(panels) + 2),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, m), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*panels, W, b.astype(jnp.float32))


@jax.custom_batching.custom_vmap
def chol_solve_batched_panels(panels, W, b):
    """Solve (L L^T) x = b from the suffix-only panel tuple of
    :func:`factor_lt_panels` — the pipelined pair-solve kernel reading the
    panels directly (no stacked LT is ever materialized)."""
    B = b.shape[0]
    Bp = _pad_batch_pow2(B)
    if Bp != B:
        # see chol_solve_batched_lt: sublane-tile alignment for odd
        # (rescue-ladder) sub-batches — zero padding is inert here too
        pad = Bp - B
        panels = tuple(jnp.concatenate(
            [p, jnp.zeros((pad, *p.shape[1:]), p.dtype)], axis=0)
            for p in panels)
        W, b = (jnp.concatenate(
            [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], axis=0)
            for a in (W, b))
    x = _chol_solve_panels_impl(tuple(panels), W, b)
    return x[:B] if Bp != B else x


@chol_solve_batched_panels.def_vmap
def _chol_solve_batched_panels_vmap(axis_size, in_batched, panels, W, b):
    pb, wb, bb = in_batched
    panels = tuple(
        p if bt else jnp.broadcast_to(p[None], (axis_size, *p.shape))
        for p, bt in zip(panels, pb))
    if not wb:
        W = jnp.broadcast_to(W[None], (axis_size, *W.shape))
    if not bb:
        b = jnp.broadcast_to(b[None], (axis_size, *b.shape))
    V, B = W.shape[0], W.shape[1]
    x = chol_solve_batched_panels(
        tuple(p.reshape(V * B, *p.shape[2:]) for p in panels),
        W.reshape(V * B, *W.shape[2:]), b.reshape(V * B, *b.shape[2:]))
    return x.reshape(V, B, *x.shape[1:]), True


# ---------------------------------------------------------------------------
# Symmetric normal-matrix assembly kernel:  M = (A * d2) @ A^T  for bf16 A.
#
# The XLA route (normal_eq.assemble) measured 27.2ms at B=256/m=1024/n=2048
# against a ~9.4ms MXU floor: the block-recursive symmetric form pays
# per-level materialization (jnp.block) and operand staging.  Here one grid
# program per instance holds THE WHOLE bf16 A in VMEM (m*n*2 = 4MB at the
# contract shape) plus the f32 output M (4MB): each 128-row block is
# split3-decomposed once in registers, every lower-triangle 128x128 tile is
# three bf16 MXU passes, and the mirror writes the transpose — HBM traffic
# is exactly A once in, M once out.
# ---------------------------------------------------------------------------


def _assemble_sym_kernel(a_hbm, d2_hbm, m_hbm, Ab, d2b, Mb, h1, h2, h3,
                         sems, *, m: int, n: int, passes: int = 3):
    i = pl.program_id(0)
    ld_a = pltpu.make_async_copy(a_hbm.at[i], Ab, sems.at[0])
    ld_d = pltpu.make_async_copy(d2_hbm.at[i], d2b, sems.at[1])
    ld_a.start()
    ld_d.start()
    ld_a.wait()
    ld_d.wait()
    nb = m // NB
    hs = (h1, h2, h3)[:passes]
    for bi in range(nb):
        # split3 of this row block's f32 (A * d2) operand, in registers:
        # exact bf16 terms, products accumulate exactly in f32 (same
        # algebra as normal_eq.assemble's blk_mm)
        W = Ab[bi * NB:(bi + 1) * NB, :].astype(jnp.float32) * d2b[:]
        for h in hs:
            t = W.astype(jnp.bfloat16)
            W = W - t.astype(jnp.float32)
            h[:] = t
        for bj in range(bi + 1):
            cols = Ab[bj * NB:(bj + 1) * NB, :]
            acc = None
            for h in hs:
                p = jax.lax.dot_general(h[:], cols, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
            if bi == bj:
                acc = 0.5 * (acc + acc.T)
                Mb[bi * NB:(bi + 1) * NB, bj * NB:(bj + 1) * NB] = acc
            else:
                Mb[bi * NB:(bi + 1) * NB, bj * NB:(bj + 1) * NB] = acc
                Mb[bj * NB:(bj + 1) * NB, bi * NB:(bi + 1) * NB] = acc.T
    st = pltpu.make_async_copy(Mb, m_hbm.at[i], sems.at[0])
    st.start()
    st.wait()


def assemble_fits_kernel(m: int, n: int, a_itemsize: int) -> bool:
    """Shape gate for :func:`assemble_sym_batched`: whole-A residency."""
    if m % NB or n % NB:
        return False
    vmem = m * n * a_itemsize + m * m * 4 + 3 * NB * n * 2 + NB * n * 4
    return vmem <= (13 << 20)


@functools.partial(jax.jit, static_argnames=("interpret", "passes"))
def _assemble_sym_impl(A, d2, interpret: bool | None = None,
                       passes: int = 3):
    if interpret is None:
        interpret = _interpret()
    B, m, n = A.shape
    kernel = functools.partial(_assemble_sym_kernel, m=m, n=n, passes=passes)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, m, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m, n), jnp.bfloat16),        # Ab: whole A resident
            pltpu.VMEM((1, n), jnp.float32),          # d2b
            pltpu.VMEM((m, m), jnp.float32),          # Mb: whole M resident
            pltpu.VMEM((NB, n), jnp.bfloat16),        # h1
            pltpu.VMEM((NB, n), jnp.bfloat16),        # h2
            pltpu.VMEM((NB, n), jnp.bfloat16),        # h3
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(A, d2[:, None, :])


def assemble_sym_batched(A: jax.Array, d2: jax.Array, passes: int = 3):
    """Batched symmetric assembly  M[b] = (A[b] * d2[b]) @ A[b]^T  for
    bf16-stored A (in-kernel split of the f32 row operand: passes=3 is
    f32-faithful, |err| <= 2^-24; passes=2 is the throughput form,
    |err| <= 2^-16 — assembly_precision="high").  Gate eligibility with
    :func:`assemble_fits_kernel`."""
    return (_assemble_sym3 if passes == 3 else _assemble_sym2)(A, d2)


def _make_assemble_sym(passes: int):
    @jax.custom_batching.custom_vmap
    def impl(A: jax.Array, d2: jax.Array):
        return _assemble_sym_impl(A, d2, passes=passes)

    @impl.def_vmap
    def _vmap(axis_size, in_batched, A, d2):
        ab, db = in_batched
        if not ab:
            A = jnp.broadcast_to(A[None], (axis_size, *A.shape))
        if not db:
            d2 = jnp.broadcast_to(d2[None], (axis_size, *d2.shape))
        V, B = A.shape[0], A.shape[1]
        M = impl(A.reshape(V * B, *A.shape[2:]),
                 d2.reshape(V * B, *d2.shape[2:]))
        return M.reshape(V, B, *M.shape[1:]), True

    return impl


_assemble_sym3 = _make_assemble_sym(3)
_assemble_sym2 = _make_assemble_sym(2)


# ---------------------------------------------------------------------------
# FUSED assembly + panel accumulation: the normal matrix never materializes.
#
# The two ~28ms stages at B=256 (XLA/Mosaic assembly of M, then the panel
# factor's accumulation reading M back) collapse into one kernel per panel:
#
#   C_k = J_r (A[o:o+NB] * d2) @ A[o:]^T J_c + reg I|diag
#         - sum_{j<k} P_j[:, :NB]^T @ P_j[:, local o:]
#
# assembled tile-by-tile from the bf16-stored A (in-register split3 of the
# f32 row operand, three bf16 MXU passes per tile — f32-faithful), with the
# Jacobi scaling applied as a row scale on the split operand and a column
# scale on each tile.  HBM traffic for the whole factor becomes: A row
# blocks streamed (sum_k (m-o) rows), prior panels streamed, C written once
# — the 8MB/instance M write+read disappears entirely.
# ---------------------------------------------------------------------------


def _fused_panel_kernel(*refs, m: int, n: int, k: int, BF: int,
                        passes: int = 3):
    """refs = (a_hbm, d2_hbm, j_hbm, reg_hbm, p_hbm[0..k-1], c_hbm,
               Ar, A0, A1, h1, h2, h3, d2b, jb, regb, C, P0, P1, sems).

    ``passes`` is the split depth of the f32 row operand: 3 = exact to f32
    (|err| <= 2^-24), 2 = |err| <= 2^-16 — a THROUGHPUT A/B knob
    (assembly_precision="high"); the convergence probe must adjudicate any
    default change (the 1-pass variant is a known failed experiment)."""
    a_hbm, d2_hbm, j_hbm, reg_hbm = refs[:4]
    p_hbm = refs[4:4 + k]
    c_hbm = refs[4 + k]
    (Ar, A0, A1, h1, h2, h3, d2b, jb, regb, C, P0, P1, sems) = refs[5 + k:]
    o = k * NB
    nb = m // NB
    b0 = pl.multiple_of(pl.program_id(0) * BF, BF)
    Ab = (A0, A1)
    Pb = (P0, P1)
    hs = (h1, h2, h3)[:passes]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (1, NB, NB), 1)
           == jax.lax.broadcasted_iota(jnp.int32, (1, NB, NB), 2))
    cps = {}

    def start_a(t):
        cp = pltpu.make_async_copy(
            a_hbm.at[pl.ds(b0, BF), t * NB:(t + 1) * NB, :],
            Ab[t % 2], sems.at[t % 2])
        cp.start()
        cps[("a", t)] = cp

    def start_p(jj):
        cp = pltpu.make_async_copy(
            p_hbm[jj].at[pl.ds(b0, BF), :, o - jj * NB:],
            Pb[jj % 2], sems.at[2 + jj % 2])
        cp.start()
        cps[("p", jj)] = cp

    # --- operand loads: A row block k, d2, j --------------------------------
    ld_r = pltpu.make_async_copy(
        a_hbm.at[pl.ds(b0, BF), o:o + NB, :], Ar, sems.at[4])
    ld_d = pltpu.make_async_copy(d2_hbm.at[pl.ds(b0, BF)], d2b, sems.at[5])
    ld_j = pltpu.make_async_copy(j_hbm.at[pl.ds(b0, BF)], jb, sems.at[6])
    ld_g = pltpu.make_async_copy(reg_hbm.at[pl.ds(b0, BF)], regb, sems.at[2])
    ld_r.start()
    ld_d.start()
    ld_j.start()
    ld_g.start()
    ld_r.wait()
    ld_d.wait()
    ld_j.wait()
    ld_g.wait()
    # --- split3 of the scaled f32 row operand, in registers ----------------
    # jb/regb are (BF, 1, ·): the unit middle dim keeps the HBM operands 3D
    # so a BF<8 batch slice never cuts the (8,128)-tiled sublane dim (real
    # Mosaic rejects 1-row slices of 2D arrays; interpret mode does not).
    # slice the ref, don't squeeze the whole (BF, 1, m) row: a full-row
    # read + squeeze is a unit-sublane relayout of m lanes on real Mosaic
    # where only NB are needed (ADVICE r3)
    jr = jb[:, 0, o:o + NB]
    W = (Ar[:].astype(jnp.float32) * d2b[:]) * jr[:, :, None]
    for h in hs:
        t_ = W.astype(jnp.bfloat16)
        W = W - t_.astype(jnp.float32)
        h[:] = t_
    # --- assembly sweep over column blocks t = k..nb-1 ----------------------
    start_a(k)
    for t in range(k, nb):
        if t + 1 < nb:
            start_a(t + 1)
        cps.pop(("a", t)).wait()
        At = Ab[t % 2]
        acc = None
        for h in hs:
            p = jax.lax.dot_general(h[:], At[:],
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        jc = jb[:, 0, t * NB:(t + 1) * NB]
        acc = acc * jc[:, None, :]
        if t == k:
            # per-instance Tikhonov reg on the diagonal block: regb is the
            # (BF, 1, NB) column-replicated reg vector, masked to the diagonal
            acc = acc + eye.astype(jnp.float32) * regb[:]
        C[:, :, (t - k) * NB:(t - k + 1) * NB] = acc
    # --- subtract prior panels (depth-1 prefetch) ---------------------------
    if k > 0:
        start_p(0)
    for jj in range(k):
        if jj + 1 < k:
            start_p(jj + 1)
        cps.pop(("p", jj)).wait()
        Pj = Pb[jj % 2]
        upd = _bmm(jnp.swapaxes(Pj[:, :, :NB], 1, 2), Pj[:])
        C[:] = C[:] - upd
    st = pltpu.make_async_copy(C, c_hbm.at[pl.ds(b0, BF)], sems.at[4])
    st.start()
    st.wait()


def _fused_chunk(B: int, m: int, n: int, w: int) -> int:
    """Largest divisor of B whose fused-panel working set fits ~11MB:
    A row blocks (1 resident + 2 stream slots + 3 bf16 splits, each
    (BF, NB, n)), the (BF, NB, w) accumulator + 2 prior-panel stream slots,
    and the j/d2 vectors."""
    per = (3 * NB * n * 2            # Ar + A0 + A1 (bf16)
           + 3 * NB * n * 2          # h1..h3 (bf16)
           + NB * n * 4              # split temporary W (f32)
           + 3 * NB * w * 4          # C + P0 + P1 (f32)
           + (m + n) * 4)
    cap = max(1, (11 << 20) // per)
    bf = 1
    for d in range(1, min(B, cap) + 1):
        if B % d == 0:
            bf = d
    return bf


def _fused_panel(A, d2r, jr, reg, panels: tuple, k: int, passes: int = 3):
    """pallas_call wrapper for :func:`_fused_panel_kernel` (batched)."""
    B, m, n = A.shape
    o = k * NB
    w = m - o
    BF = _fused_chunk(B, m, n, w)
    kernel = functools.partial(_fused_panel_kernel, m=m, n=n, k=k, BF=BF,
                               passes=passes)
    return pl.pallas_call(
        kernel,
        grid=(B // BF,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (4 + k),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, NB, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BF, NB, n), jnp.bfloat16),    # Ar: row block k
            pltpu.VMEM((BF, NB, n), jnp.bfloat16),    # A0: column stream
            pltpu.VMEM((BF, NB, n), jnp.bfloat16),    # A1
            pltpu.VMEM((BF, NB, n), jnp.bfloat16),    # h1
            pltpu.VMEM((BF, NB, n), jnp.bfloat16),    # h2
            pltpu.VMEM((BF, NB, n), jnp.bfloat16),    # h3
            pltpu.VMEM((BF, 1, n), jnp.float32),      # d2b
            pltpu.VMEM((BF, 1, m), jnp.float32),      # jb
            pltpu.VMEM((BF, 1, NB), jnp.float32),     # regb
            pltpu.VMEM((BF, NB, w), jnp.float32),     # C accumulator
            pltpu.VMEM((BF, NB, w), jnp.float32),     # P0 prior stream
            pltpu.VMEM((BF, NB, w), jnp.float32),     # P1
            pltpu.SemaphoreType.DMA((7,)),
        ],
        interpret=_interpret(),
    )(A, d2r, jr, reg, *panels)


def fused_factor_fits(m: int, n: int, a_dtype) -> bool:
    """Eligibility for :func:`factor_fused_panels`: bf16 A, 128-aligned."""
    return a_dtype == jnp.bfloat16 and m % NB == 0 and n % NB == 0


def factor_fused_panels(A, d2, j, reg, passes: int = 3):
    """Fused assemble+factor: A (B, m, n) bf16, d2 (B, n), j (B, m) the
    Jacobi scale, reg (B,) the (already reg_scale-multiplied) Tikhonov
    term -> (panels, W) of the scaled regularized normal matrix, in the
    same layout as :func:`factor_lt_panels`.  ``passes`` = split depth of
    the assembly operand (3 = f32-exact; 2 = throughput A/B)."""
    return (_factor_fused_panels3 if passes == 3
            else _factor_fused_panels2)(A, d2, j, reg)


def _make_fused_panels(passes: int):
    @jax.custom_batching.custom_vmap
    def impl(A: jax.Array, d2: jax.Array, j: jax.Array, reg: jax.Array):
        B, m, n = A.shape
        nblk = m // NB
        d2r = d2[:, None, :].astype(jnp.float32)
        jr = j.astype(jnp.float32)[:, None, :]
        # per-instance reg (reg_boost differs across a solve batch),
        # replicated across NB columns so the kernel's diagonal add is a
        # clean slice; (B, 1, NB) like d2r/jr — see the tiling note in the
        # kernel
        regv = jnp.broadcast_to(
            jnp.reshape(reg, (B, 1, 1)).astype(jnp.float32), (B, 1, NB))
        panels = []
        ws = []
        for k in range(nblk):
            C = _fused_panel(A, d2r, jr, regv, tuple(panels), k,
                             passes=passes)
            L_D, W_D = _factor_block_twolevel(C[:, :, :NB], mosaic=False)
            ws.append(W_D)
            LdT = jnp.swapaxes(L_D, 1, 2)
            if (k + 1) * NB < m:
                Pt = _bmm(W_D, C[:, :, NB:])
                panels.append(jnp.concatenate([LdT, Pt], axis=2))
            else:
                panels.append(LdT)
        return tuple(panels), jnp.stack(ws, axis=1)

    @impl.def_vmap
    def _vmap(axis_size, in_batched, A, d2, j, reg):
        ops = [A, d2, j, reg]
        ops = [o if bt else jnp.broadcast_to(o[None], (axis_size, *o.shape))
               for o, bt in zip(ops, in_batched)]
        A, d2, j, reg = ops
        V, B = A.shape[0], A.shape[1]
        panels, W = impl(
            A.reshape(V * B, *A.shape[2:]), d2.reshape(V * B, *d2.shape[2:]),
            j.reshape(V * B, *j.shape[2:]), reg.reshape(V * B))
        panels = tuple(p.reshape(V, B, *p.shape[1:]) for p in panels)
        return ((panels, W.reshape(V, B, *W.shape[1:])),
                (tuple(True for _ in panels), True))

    return impl


_factor_fused_panels3 = _make_fused_panels(3)
_factor_fused_panels2 = _make_fused_panels(2)


# --- single-instance conveniences (used by normal_eq under vmap) -----------

def cholesky(M: jax.Array):
    """Single (m, m) Cholesky via the batched kernel; returns L only."""
    L, _ = cholesky_batched(M[None])
    return L[0]
