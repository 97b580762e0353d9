"""Normal-equations linear-system layer (SURVEY.md component N8).

Per Mehrotra iteration the KKT system is reduced to

    (A D^2 A^T + reg I) dy = rhs,   D^2 = diag(x/s)

(reference components R5/R6; BASELINE.json names the ``A*D^2*A^T`` form).
Assembly is a fused XLA einsum ``(A * d2) @ A.T``; factorization is a
Cholesky (XLA potrf or the Pallas kernel, selected by
``SolverOptions.chol_backend``); the factor is reused for the predictor and
corrector solves, each tightened by iterative refinement whose residual is
computed matrix-free through A at HIGHEST precision — the key device-side
mitigation for the no-f64-on-TPU problem (SURVEY.md §7 hard part 1).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ipx.numerics import mm, mv
from ipx.options import SolverOptions


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NormalEqFactor:
    """Cholesky factor of the Jacobi-scaled normal matrix.

    L is the Cholesky factor of  J (A D^2 A^T) J + reg I  with
    J = diag(1/sqrt(diag(A D^2 A^T))).  The diagonal scaling removes the
    basic-vs-nonbasic scale disparity (which is almost exactly diagonal), so
    the factored matrix has unit diagonal — the decisive f32 robustness trick:
    cholesky stays stable far deeper into the ill-conditioned endgame, and
    ``reg`` is meaningfully relative to 1.

    With the Pallas backend, ``L`` is the 128-padded factor (identity
    extension) and ``W`` holds the inverted 128x128 diagonal blocks that turn
    the triangular solves into MXU matmuls (ipx/kernels/cholesky.py); with
    the XLA backend ``W`` is an empty placeholder and solves go through
    ``jax.scipy.linalg.solve_triangular``.
    """
    L: jax.Array        # xla backend: (m, m) lower-triangular Cholesky
                        # factor (empty placeholder for pallas-family
                        # backends, which carry LT instead)
    j: jax.Array        # (m,) Jacobi scale 1/sqrt(diag M)
    d2: jax.Array       # (n,)
    ok: jax.Array       # () bool: factorization succeeded (finite, pos diag)
    W: jax.Array        # pallas: (m_pad/128, 128, 128) diag-block inverses
    LT: jax.Array       # pallas-family: (m_pad, m_pad) TRANSPOSED factor
                        # L^T — the one stored layout; both sweeps of the
                        # fused pair-solve kernel read its strict-suffix
                        # row stripes (ipx/kernels/cholesky.py), so no
                        # (B, m, m) transpose is ever materialized
    M: jax.Array        # (m, m) assembled (unscaled, unregularized) matrix —
                        # the CG operator when opts.cg_operator="assembled":
                        # one m^2 stream per matvec instead of two m*n A
                        # streams (4x less HBM traffic; the OUTER kkt
                        # refinement in mehrotra.py still uses the true A at
                        # HIGHEST precision, so final accuracy is unaffected)
    LTp: tuple = ()     # pallas_left: SUFFIX-ONLY transposed row panels
                        # (LTp[k]: (128, m_pad - 128k), rows k*128..(k+1)*128
                        # of L^T from the diagonal on) — the panel-major
                        # factor layout (kernels/cholesky.factor_lt_panels);
                        # total storage m(m+128)/2, no (m, m) buffer exists


def _mm_split3_vs_bf16(W: jax.Array, Abf_t: jax.Array):
    """f32 matrix x EXACTLY-bf16 matrix, f32-faithful.

    r5 CORRECTION: the original hand-rolled three-pass bf16 split was
    SILENTLY FOLDED to a single bf16 pass by XLA's bf16-propagation pass
    on TPU — every f32 intermediate (the d2-scaled operand and both
    residuals) fed only bf16-consuming slots, so the whole chain was
    demoted to bf16 and h2 = h3 computed as exact zeros (measured:
    split3 == one-pass bit-for-bit, rel err ~4e-4 on endgame-spread d2;
    an optimization_barrier does not stop the pass).  The mixed
    f32 x bf16 HIGHEST dot keeps the split INSIDE the dot, where no HLO
    pass can break it: measured rel err 2.1e-7 on the same operands,
    and only the f32 side is split (~3 passes) because the bf16 side
    needs none.
    """
    return jax.lax.dot_general(
        W, Abf_t, (((W.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def assemble(A: jax.Array, d2: jax.Array, precision: str = "highest"):
    """M = (A * d2) @ A.T, exploiting symmetry.

    A dense ``(A*d2) @ A.T`` computes every off-diagonal entry twice.  At
    ``precision="highest"`` (the 6-pass bf16 f32-emulation the f32 IPM
    needs) the assembly is MXU-COMPUTE-bound, so the recursion below — a
    block syrk that forms only the lower triangle, mirroring the rest —
    saves ~44% of the matmul passes at m=1024 (measured: the assembly was
    ~12% of the batched iteration).  Every product is a plain XLA matmul on
    (>=128)-sized blocks, so vmap/sharding compose unchanged.

    When A is STORED bf16 (``a_storage="bfloat16"``: entries exactly
    bf16-representable) and f32-faithful assembly is requested, each block
    product runs as a 3-pass split of the f32 ``rows * d2`` operand against
    the bf16 rows directly (:func:`_mm_split3_vs_bf16`) — half the MXU
    passes of HIGHEST at the same accuracy.  This is NOT the round-1
    failed "bf16 3-pass assembly" (that ROUNDED the A*d2 operand to one
    bf16 term, a 0.4% error that drowned endgame directions); the split
    keeps all f32 bits.
    """
    m = A.shape[0]
    # Split depth of the f32 (A*d2) operand against bf16-stored A:
    # "highest" = 3 exact passes (f32-faithful), "high" = 2 passes
    # (|err| <= 2^-16 — sufficient for a PRECONDITIONER factor whose
    # accuracy is restored by matrix-free CG refinement; throughput A/B,
    # the convergence probe adjudicates).  1-pass rounding is the known
    # failed experiment — never offered here.
    passes = {"highest": 3, "high": 2}.get(precision, 0)
    split3 = A.dtype == jnp.bfloat16 and passes > 0

    if split3:
        from ipx.kernels import cholesky as pk
        if pk.assemble_fits_kernel(m, A.shape[1], A.dtype.itemsize):
            # whole-A-resident Mosaic tile kernel: HBM traffic is exactly
            # A in + M out; in-register split per row block
            return pk.assemble_sym_batched(A[None], d2[None],
                                           passes=passes)[0]

    def blk_mm(alo, ahi, blo, bhi):
        # Product of row blocks  (A*d2)[alo:ahi] @ A[blo:bhi].T  — expressed
        # as a dim-1 contraction so no transposed copy is ever materialized.
        # The split3 scale/round/subtract chain runs PER BLOCK on purpose: a
        # whole-matrix pre-split was tried in r3 and measured SLOWER (39.4
        # vs 27.2 ms at B=256) — the f32 residual chain of the full (m, n)
        # operand round-trips HBM three times, while the per-block chain
        # fuses into each product's operand pipeline.
        if split3:
            # r5: ONE mixed f32 x bf16 HIGHEST dot — the hand-rolled pass
            # loop was folded to a single bf16 pass by XLA's
            # bf16-propagation pass on TPU (see _mm_split3_vs_bf16)
            Wb = A[alo:ahi].astype(jnp.float32) * d2[None, :]
            return jax.lax.dot_general(Wb, A[blo:bhi],
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=jax.lax.Precision.HIGHEST)
        from ipx.numerics import precision_of
        Wb = A[alo:ahi].astype(jnp.float32) * d2[None, :]
        return jax.lax.dot_general(
            Wb, A[blo:bhi].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision_of(precision))

    if m < 256:
        M = blk_mm(0, m, 0, m)
        return 0.5 * (M + M.T)

    def sym(lo, hi):
        r = hi - lo
        if r <= 128:
            Mr = blk_mm(lo, hi, lo, hi)
            return 0.5 * (Mr + Mr.T)
        h = r // 2
        C11 = sym(lo, lo + h)
        C22 = sym(lo + h, hi)
        C21 = blk_mm(lo + h, hi, lo, lo + h)
        return jnp.block([[C11, C21.T], [C21, C22]])

    return sym(0, m)


def factor(A: jax.Array, d2: jax.Array, opts: SolverOptions,
           reg_scale=1.0) -> NormalEqFactor:
    """Assemble, Jacobi-scale, and factor the regularized normal matrix.

    The Tikhonov term is added AFTER scaling (unit diagonal), so ``opts.reg``
    is a clean relative perturbation that iterative refinement — whose
    residual uses the true unscaled, unregularized operator — then removes.
    ``reg_scale`` is the iteration-level escalation factor (IPMState.reg_boost)
    raised after a non-finite step.

    With ``opts.linsys == "sharded"`` (BASELINE config 4: m too large for a
    replicated m x m matrix) this dispatches to the Schur-complement layer
    (ipx/linsys/schur.py) — static trace-time dispatch, same call sites.
    """
    if opts.linsys == "sharded":
        from ipx.linsys import schur
        return schur.factor(A, d2, opts, reg_scale)
    if opts.linsys == "augmented":
        from ipx.linsys import augmented
        return augmented.factor(A, d2, opts, reg_scale)
    if opts.linsys in ("augmented_schur", "sharded_schur"):
        from ipx.linsys import augmented
        return augmented.factor_schur(A, d2, opts, reg_scale)
    if opts.chol_backend == "pallas_left" and opts.cg_operator != "assembled":
        from ipx.kernels import cholesky as pk
        if (pk.fused_factor_fits(A.shape[0], A.shape[1], A.dtype)
                and opts.assembly_precision in ("highest", "high")):
            # FUSED assemble+factor: the scaled regularized normal matrix is
            # assembled panel-by-panel from the bf16 A inside the factor
            # kernels and never materializes (kernels/cholesky.py).  The
            # Jacobi scale comes from diag(M) = (A∘A) @ d2 — one matvec.
            m_ = A.shape[0]
            diag = mv(jnp.square(A.astype(jnp.float32)), d2,
                      opts.matmul_precision)
            tiny_ = jnp.asarray(jnp.finfo(jnp.float32).tiny, jnp.float32)
            j = jax.lax.rsqrt(jnp.maximum(diag, tiny_))
            reg = (jnp.asarray(opts.reg, jnp.float32)
                   * jnp.asarray(reg_scale, jnp.float32))
            panels1, W1 = pk.factor_fused_panels(
                A[None], d2[None].astype(jnp.float32), j[None],
                jnp.reshape(reg, (1,)),
                passes=3 if opts.assembly_precision == "highest" else 2)
            LTp = tuple(p[0] for p in panels1)
            W = W1[0]
            zero = jnp.zeros((0,), jnp.float32)
            ldiag = jnp.concatenate(
                [jnp.diagonal(p[:, :pk.NB]) for p in LTp])
            ok = (jnp.all(jnp.isfinite(ldiag)) & jnp.all(ldiag > 0)
                  & jnp.all(jnp.isfinite(j)))
            return NormalEqFactor(L=zero, j=j, d2=d2, ok=ok, W=W, M=zero,
                                  LT=zero, LTp=LTp)
    M = assemble(A, d2, opts.assembly_precision)
    m = M.shape[-1]
    diag = jnp.diagonal(M)
    tiny = jnp.asarray(jnp.finfo(M.dtype).tiny, M.dtype)
    j = jax.lax.rsqrt(jnp.maximum(diag, tiny))
    Ms = M * j[:, None] * j[None, :]
    reg = jnp.asarray(opts.reg, M.dtype) * jnp.asarray(reg_scale, M.dtype)
    Ms = Ms + reg * jnp.eye(m, dtype=M.dtype)

    if opts.chol_backend in ("pallas", "pallas_left", "panels", "hybrid",
                             "blocked", "blocked_left"):
        # Imported lazily: the XLA path must stay importable everywhere.
        from ipx.kernels import cholesky as pk
        # Pad to a multiple of the 128 MXU tile with an identity extension:
        # blkdiag(Ms, I) factors to blkdiag(L, I), and zero-padded rhs
        # round-trips exactly, so padding is invisible to the solve.
        m_pad = -(-m // pk.NB) * pk.NB
        if m_pad != m:
            Mp = jnp.zeros((m_pad, m_pad), Ms.dtype)
            Mp = Mp.at[:m, :m].set(Ms)
            Mp = Mp.at[jnp.arange(m, m_pad), jnp.arange(m, m_pad)].set(1.0)
        else:
            Mp = Ms
        if opts.chol_backend in ("pallas_left", "panels"):
            if opts.chol_backend == "pallas_left":
                # panel-major factor: Mosaic stream-accumulate kernels + XLA
                # full-batch diagonal chains, suffix-only panel outputs
                # (kernels/cholesky.factor_lt_panels)
                panels1, W1 = pk.factor_lt_panels(
                    Mp[None].astype(jnp.float32))
                LTp = tuple(p[0] for p in panels1)
                W = W1[0]
            else:
                # "panels": the XLA-level left-looking factor emitting the
                # suffix-only panel layout directly (no (m, m) buffer, no
                # re-layout between factor and solve)
                LTp, W = _blocked_potrf_left_panels(
                    Mp.astype(jnp.float32), pk.NB)
            LT = jnp.zeros((0,), Ms.dtype)
            L = jnp.zeros((0,), Ms.dtype)
            ldiag = jnp.concatenate(
                [jnp.diagonal(p[:, :pk.NB]) for p in LTp])
            ok = (jnp.all(jnp.isfinite(ldiag)) & jnp.all(ldiag > 0)
                  & jnp.all(jnp.isfinite(j)))
            M_op = M if opts.cg_operator == "assembled" else jnp.zeros(
                (0,), M.dtype)
            return NormalEqFactor(L=L, j=j, d2=d2, ok=ok, W=W, M=M_op,
                                  LT=LT, LTp=LTp)
        if opts.chol_backend == "blocked_left":
            # the production factor: emits the transposed layout directly
            LT, W = _blocked_potrf_left(Mp.astype(jnp.float32), pk.NB)
        else:
            if opts.chol_backend == "pallas":
                Lp, W = pk.cholesky_batched(Mp[None].astype(jnp.float32))
                Lp, W = Lp[0], W[0]
            elif opts.chol_backend == "blocked":
                Lp, W = _blocked_potrf(Mp.astype(jnp.float32), pk.NB)
            else:
                # hybrid: XLA's potrf for the factor; diag-block inverses
                # via the recursive trtri-style combine below (same scheme
                # the Pallas kernel uses in-kernel) — batched MXU matmuls,
                # ~6x cheaper than a vmapped solve against the identity.
                Lp = jnp.linalg.cholesky(Mp.astype(jnp.float32))
                nblk = m_pad // pk.NB
                blocks = jnp.stack([Lp[k * pk.NB:(k + 1) * pk.NB,
                                       k * pk.NB:(k + 1) * pk.NB]
                                    for k in range(nblk)])
                W = _invert_lower_blocks(blocks)
            # one transpose at factor time (not per solve call)
            LT = Lp.T
        L = jnp.zeros((0,), Ms.dtype)
        ldiag = jnp.diagonal(LT)
    else:
        L = jnp.linalg.cholesky(Ms)
        W = jnp.zeros((0,), Ms.dtype)
        LT = jnp.zeros((0,), Ms.dtype)
        ldiag = jnp.diagonal(L)

    ok = (jnp.all(jnp.isfinite(ldiag)) & jnp.all(ldiag > 0)
          & jnp.all(jnp.isfinite(j)))
    if opts.cg_operator == "assembled":
        M_op = M
    else:
        M_op = jnp.zeros((0,), M.dtype)
    return NormalEqFactor(L=L, j=j, d2=d2, ok=ok, W=W, M=M_op, LT=LT)


def _blocked_potrf(Ms: jax.Array, nb: int = 128, precision=None,
                   diag: str = "twolevel"):
    """Right-looking blocked Cholesky at the XLA level: returns (L, W) with
    W the (m/nb, nb, nb) diagonal-block inverses the Pallas pair-solve
    kernel consumes — computed as a BY-PRODUCT of the panel steps, so the
    separate W-inversion pass of the "hybrid" backend disappears.

    Why not ``jnp.linalg.cholesky`` on the full matrix (the "hybrid"
    backend)?  XLA's potrf expansion drives its panel solves through the
    TriangularSolveExpander inside a dynamic-slice while-loop — measured
    far off the arithmetic floor for batched mid-size matrices.  Here every
    panel is a STATIC step: one batched nb x nb potrf (tiny), one trtri
    block inverse (:func:`_invert_lower_blocks`), and two large MXU matmuls
    (panel TRSM-as-matmul against W, trailing syrk) — the shapes shrink
    statically, vmap composes, and XLA fuses the scale/update chain.

    Precision: the trailing syrk accumulates across m/nb panels into the
    matrix later panels factor, so it uses HIGHEST (f32-faithful) — a
    1-pass bf16 product here is the same trap as the failed bf16
    preconditioner assembly (endgame small-eigenvalue directions drown).
    """
    m = Ms.shape[-1]
    hp = precision if precision is not None else jax.lax.Precision.HIGHEST
    dt = Ms.dtype
    T = Ms
    cols = []
    winvs = []
    for o in range(0, m, nb):
        if diag == "twolevel" and nb == 128:
            # The kernel module's two-level 128-block factor is pure jnp
            # (masked iota selects + batched dots) and runs fine at the XLA
            # level too; it co-computes inv(L_kk) AND cuts the sequential
            # chain to 32-wide sub-steps — measured 16.9 ms for the XLA
            # potrf expander on the same (8B, 128, 128) diagonal work.
            from ipx.kernels import cholesky as pk
            Ld1, Wd1 = pk._factor_block_twolevel(T[None, :nb, :nb],
                                                 mosaic=False)
            Ld, Wd = Ld1[0], Wd1[0]
        else:
            Ld = jnp.linalg.cholesky(T[:nb, :nb])
            Wd = _invert_lower_blocks(Ld[None])[0]
        winvs.append(Wd)
        if m - o - nb > 0:
            P = jnp.matmul(T[nb:, :nb], Wd.T, precision=hp)
            T = T[nb:, nb:] - jnp.matmul(P, P.T, precision=hp)
            col = jnp.concatenate([Ld, P], axis=0)
        else:
            col = Ld
        if o:
            col = jnp.concatenate([jnp.zeros((o, nb), dt), col], axis=0)
        cols.append(col)
    L = jnp.concatenate(cols, axis=1)
    if nb == 128:
        W = jnp.stack(winvs)
    else:
        # pair solves consume 128-blocks regardless of the panel width:
        # re-derive them from L's diagonal (one extra small trtri pass)
        blocks = jnp.stack([L[k * 128:(k + 1) * 128, k * 128:(k + 1) * 128]
                            for k in range(m // 128)])
        W = _invert_lower_blocks(blocks)
    return L, W


def _blocked_potrf_left(Ms: jax.Array, nb: int = 128, precision=None):
    """Left-looking blocked Cholesky returning the TRANSPOSED factor:
    ``(LT, W)`` with ``LT = L^T`` — the layout the fused pair-solve kernel
    consumes — and W the (m/nb, nb, nb) diagonal-block inverses.

    The right-looking form materializes the whole trailing matrix every
    panel (sum over panels of (m-o)^2 read+write ~ 2/3 m^3/nb elements of
    HBM round-trips).  Left-looking instead DEFERS updates: each panel
    reads the original ROW panel of M plus the already-computed LT rows
    and applies one matmul.  Working directly in the transposed layout,

        C^T = M[o:o+nb, o:] - LT[:o, o:o+nb]^T @ LT[:o, o:]
        P^T = inv(L_kk) @ C^T[:, nb:]

    every product lands in LT's row panel with NO transposition anywhere
    (M is symmetric, so its row panel IS the column panel transposed; the
    only transposed operand sits inside a matmul, which the MXU handles
    natively).  FLOPs and numerics are identical to the untransposed form
    (same Schur complements, evaluated lazily, same precision).

    ONE carried (m, m) buffer updated in place (dynamic_update_slice with
    static offsets) instead of per-panel concatenations: the measured cost
    of this factor at m=1024 is NOT MXU passes (DEFAULT 1-pass timed the
    same as HIGHEST 6-pass) but XLA materialization traffic.  A/B'd at
    B=256: concat history 34.3 ms, per-column small matmuls 34.5 ms,
    carried buffer 31.0 ms.
    """
    m = Ms.shape[-1]
    hp = precision if precision is not None else jax.lax.Precision.HIGHEST
    dt = Ms.dtype
    LT = jnp.zeros((m, m), dt)
    winvs = []
    for o in range(0, m, nb):
        Ct = Ms[o:o + nb, o:]                                # (nb, m-o)
        if o:
            # accumulation against the already-written rows of LT
            Ct = Ct - jnp.matmul(LT[:o, o:o + nb].T, LT[:o, o:],
                                 precision=hp)
        if nb == 128:
            from ipx.kernels import cholesky as pk
            # the diagonal Schur block is symmetric: its transpose IS the
            # block, so Ct[:, :nb] feeds the factor directly
            Ld1, Wd1 = pk._factor_block_twolevel(Ct[None, :, :nb],
                                                 mosaic=False)
            Ld, Wd = Ld1[0], Wd1[0]
        else:
            Ld = jnp.linalg.cholesky(Ct[:, :nb])
            Wd = _invert_lower_blocks(Ld[None])[0]
        winvs.append(Wd)
        if m - o - nb > 0:
            Pt = jnp.matmul(Wd, Ct[:, nb:], precision=hp)    # (nb, m-o-nb)
            row = jnp.concatenate([Ld.T, Pt], axis=1)
        else:
            row = Ld.T
        LT = jax.lax.dynamic_update_slice(LT, row, (o, o))
    if nb == 128:
        W = jnp.stack(winvs)
    else:
        blocks = jnp.stack(
            [LT[k * 128:(k + 1) * 128, k * 128:(k + 1) * 128].T
             for k in range(m // 128)])
        W = _invert_lower_blocks(blocks)
    return LT, W


def _potrf_left_scan(Ms: jax.Array, w: int = 128):
    """Left-looking blocked Cholesky with O(1) program size in m: ONE
    ``lax.fori_loop`` over 128-wide row panels with FIXED full-width
    (masked) operands.  Returns ``(LT, W)`` — the transposed factor and
    the (m/128, 128, 128) diagonal-block inverses, same contract as
    :func:`_blocked_potrf_left`.

    The statically-unrolled factors above emit O(m/128) HLO ops with
    per-panel shrinking shapes; at m >= 8192 the whole-program compile
    (inside the config-4 while_loop body) SIGKILLed the remote XLA
    compile helper (VERDICT r3 missing #1).  Here each panel step reads a
    full-width row of M and applies one full-width accumulation matmul

        C^T = M[o:o+w, :] - LT[:, o:o+w]^T @ LT     (LT rows >= o still 0)

    so the trip count is dynamic and the graph is a few dozen ops at ANY
    m.  Cost: the accumulation is 2*m^3 matmul FLOPs vs m^3/3 for the
    shrinking-shape form (~6x) — at m=8192/HIGHEST that is ~0.1s/factor,
    the price of compiling at all.  Numerics are identical to the static
    form (same Schur complements, same HIGHEST accumulate, same twolevel
    diagonal factor); only dead masked columns are computed extra.
    """
    from ipx.kernels import cholesky as pk
    from jax import lax
    m = Ms.shape[-1]
    assert m % w == 0, f"m={m} must be a multiple of {w}"
    nb = m // w
    hp = jax.lax.Precision.HIGHEST
    cols = jnp.arange(m)[None, :]
    Ms = Ms.astype(jnp.float32)

    def body(k, carry):
        LT, W = carry
        o = k * w
        rowM = lax.dynamic_slice(Ms, (o, 0), (w, m))
        colLT = lax.dynamic_slice(LT, (0, o), (m, w))
        Ct = rowM - jnp.matmul(colLT.T, LT, precision=hp)
        Dblk = lax.dynamic_slice(Ct, (0, o), (w, w))
        Ld1, Wd1 = pk._factor_block_twolevel(Dblk[None], mosaic=False)
        Ld, Wd = Ld1[0], Wd1[0]
        Pt = jnp.matmul(Wd, Ct, precision=hp)          # (w, m) full width
        newrow = jnp.where(cols >= o + w, Pt, 0.0)
        newrow = lax.dynamic_update_slice(newrow, Ld.T, (0, o))
        LT = lax.dynamic_update_slice(LT, newrow, (o, 0))
        W = lax.dynamic_update_slice(W, Wd[None], (k, 0, 0))
        return LT, W

    LT0 = jnp.zeros((m, m), jnp.float32)
    W0 = jnp.zeros((nb, w, w), jnp.float32)
    return lax.fori_loop(0, nb, body, (LT0, W0))


def _potrf_left_scan_inplace(Ms: jax.Array, w: int = 128):
    """:func:`_potrf_left_scan` with the factor computed IN M's OWN BUFFER.

    Left-looking Cholesky has the classic in-place structure: panel step k
    reads M's row panel [o:o+w] (untouched until now) and LT rows < o
    (already written), then overwrites rows [o:o+w] with the new LT rows —
    reads and writes never collide, so ONE (m, m) carry serves as both M
    and LT (XLA aliases fori_loop carries in place).  vs the two-buffer
    scan this halves the factor's transient footprint — at m=32768 the
    separate LT0 buffer is 4.3GB, the difference between the config-4
    contract size fitting a 16GB chip and not (VERDICT r4 missing #1).
    The only delta from _potrf_left_scan's algebra: the accumulation
    operand column block is masked to rows < o (those rows of the carry
    are LT; rows >= o still hold M and must not contribute — in the
    two-buffer form they were structurally zero).
    """
    from ipx.kernels import cholesky as pk
    from jax import lax
    m = Ms.shape[-1]
    assert m % w == 0, f"m={m} must be a multiple of {w}"
    nb = m // w
    hp = jax.lax.Precision.HIGHEST
    cols = jnp.arange(m)[None, :]
    rows = jnp.arange(m)[:, None]

    def body(k, carry):
        X, W = carry
        o = k * w
        rowM = lax.dynamic_slice(X, (o, 0), (w, m))
        colX = lax.dynamic_slice(X, (0, o), (m, w))
        colLT = jnp.where(rows < o, colX, 0.0)
        Ct = rowM - jnp.matmul(colLT.T, X, precision=hp)
        Dblk = lax.dynamic_slice(Ct, (0, o), (w, w))
        Ld1, Wd1 = pk._factor_block_twolevel(Dblk[None], mosaic=False)
        Ld, Wd = Ld1[0], Wd1[0]
        Pt = jnp.matmul(Wd, Ct, precision=hp)
        newrow = jnp.where(cols >= o + w, Pt, 0.0)
        newrow = lax.dynamic_update_slice(newrow, Ld.T, (0, o))
        X = lax.dynamic_update_slice(X, newrow, (o, 0))
        W = lax.dynamic_update_slice(W, Wd[None], (k, 0, 0))
        return X, W

    W0 = jnp.zeros((nb, w, w), jnp.float32)
    return lax.fori_loop(0, nb, body, (Ms.astype(jnp.float32), W0))


def _blocked_potrf_left_panels(Ms: jax.Array, nb: int = 128, precision=None):
    """Left-looking blocked Cholesky emitting SUFFIX-ONLY transposed row
    panels directly: ``(panels, W)`` with ``panels[k]`` the (nb, m - k*nb)
    rows k*nb..(k+1)*nb of L^T from the diagonal on — the exact layout
    :func:`ipx.kernels.cholesky.chol_solve_batched_panels` consumes — and
    W the (m/nb, nb, nb) diagonal-block inverses.

    Same algebra as :func:`_blocked_potrf_left`, but the (m, m) carried
    buffer (and its per-panel dynamic_update_slice round-trips) never
    exists: panel k's deferred accumulation reads each PRIOR panel's
    aligned column slice,

        C^T = M[o:o+nb, o:] - sum_{i<k} P_i[:, o-i*nb : o-i*nb+nb]^T
                                         @ P_i[:, o-i*nb:]

    (k static matmuls on contiguous suffix slices).  Total reads/FLOPs are
    identical to the carried-buffer form; what changes is that every
    operand is a panel the solve kernel wants anyway, so the factor's
    output IS the solve's input with zero re-layout.  Feeds the "panels"
    ``chol_backend`` — the r4 production route (the r3 ledger had the
    panel pair-solve at 1.9ms/apply vs 16.5 for the (m, m)-LT kernel at
    B=256, m=1024: strided stripe DMA vs contiguous panels).
    """
    m = Ms.shape[-1]
    hp = precision if precision is not None else jax.lax.Precision.HIGHEST
    panels = []
    winvs = []
    for k in range(0, m // nb):
        o = k * nb
        Ct = Ms[o:o + nb, o:]                                # (nb, m-o)
        for i, p in enumerate(panels):
            off = o - i * nb
            Ct = Ct - jnp.matmul(p[:, off:off + nb].T, p[:, off:],
                                 precision=hp)
        if nb == 128:
            from ipx.kernels import cholesky as pk
            Ld1, Wd1 = pk._factor_block_twolevel(Ct[None, :, :nb],
                                                 mosaic=False)
            Ld, Wd = Ld1[0], Wd1[0]
        else:
            Ld = jnp.linalg.cholesky(Ct[:, :nb])
            Wd = _invert_lower_blocks(Ld[None])[0]
        winvs.append(Wd)
        if m - o - nb > 0:
            Pt = jnp.matmul(Wd, Ct[:, nb:], precision=hp)    # (nb, m-o-nb)
            panels.append(jnp.concatenate([Ld.T, Pt], axis=1))
        else:
            panels.append(Ld.T)
    return tuple(panels), jnp.stack(winvs)


def _invert_lower_blocks(blocks: jax.Array, base: int = 32) -> jax.Array:
    """inv of (nb, q, q) lower-triangular blocks, LAPACK-trtri style:
    recursive 2x2 splitting  inv([[A,0],[B,C]]) = [[iA,0],[-iC B iA, iC]]
    with a backward-stable batched solve_triangular at the base size.

    (A Neumann/nilpotent-product form was tried first — 30% cheaper but
    UNSTABLE for the ill-conditioned endgame blocks: large intermediate
    N-powers leak f32 rounding and cost a convergence probe.  The matmul
    combines here are stable compositions of stable inverses.)"""
    nb, q, _ = blocks.shape
    dt = blocks.dtype
    hp = jax.lax.Precision.HIGHEST
    if q <= base:
        eye = jnp.eye(q, dtype=dt)
        return jax.vmap(lambda Lk: jax.scipy.linalg.solve_triangular(
            Lk, eye, lower=True))(blocks)
    h = q // 2
    iA = _invert_lower_blocks(blocks[:, :h, :h], base)
    iC = _invert_lower_blocks(blocks[:, h:, h:], base)
    B = blocks[:, h:, :h]
    off = -jnp.matmul(iC, jnp.matmul(B, iA, precision=hp), precision=hp)
    top = jnp.concatenate([iA, jnp.zeros((nb, h, q - h), dt)], axis=2)
    bot = jnp.concatenate([off, iC], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def use_fused_matvec(opts: SolverOptions, A: jax.Array) -> bool:
    """Static (trace-time) eligibility for the fused A-resident kernel."""
    if opts.matvec_backend != "fused":
        return False
    if A.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if opts.linsys != "dense":
        return False
    from ipx.kernels import fused as fk
    return fk.stripe_width(A.shape[-2], A.shape[-1],
                           A.dtype.itemsize) is not None


def _chol_solve(fac: NormalEqFactor, rhs: jax.Array, backend: str) -> jax.Array:
    if backend in ("pallas_left", "panels"):
        from ipx.kernels import cholesky as pk
        m = rhs.shape[-1]
        m_pad = fac.LTp[0].shape[-1]
        r = rhs if m_pad == m else jnp.zeros((m_pad,), rhs.dtype).at[:m].set(rhs)
        y = pk.chol_solve_batched_panels(
            tuple(p[None] for p in fac.LTp), fac.W[None], r[None])[0]
        return y[:m]
    if backend in ("pallas", "hybrid", "blocked", "blocked_left"):
        from ipx.kernels import cholesky as pk
        m = rhs.shape[-1]
        m_pad = fac.LT.shape[-1]
        r = rhs if m_pad == m else jnp.zeros((m_pad,), rhs.dtype).at[:m].set(rhs)
        y = pk.chol_solve_batched_lt(fac.LT[None], fac.W[None], r[None])[0]
        return y[:m]
    t = jax.scipy.linalg.solve_triangular(fac.L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(fac.L.T, t, lower=False)


def solve(fac: NormalEqFactor, A: jax.Array, rhs: jax.Array,
          opts: SolverOptions) -> jax.Array:
    """Solve (A D^2 A^T) dy = rhs: preconditioned CG on the TRUE operator.

    The Cholesky factor of the Jacobi-scaled, regularized matrix is the
    preconditioner; the Krylov operator is applied matrix-free as
    ``A @ (d2 * (A.T @ v))`` at HIGHEST precision, bypassing both the
    Tikhonov perturbation and the assembled-M rounding.  PCG (rather than
    stationary refinement) is what survives the f32 endgame: near-singular
    directions where reg/(lam+reg) ~ 1 stall a Richardson iteration but cost
    CG only ~sqrt(1 + reg/lam_min) iterations (SURVEY.md §7 hard part 1;
    PAPERS.md hybrid direct-iterative background).  ``opts.refine_steps``
    is the CG iteration count — a static trip count, so the loop unrolls
    into one fused XLA region with no convergence control flow.
    """
    if opts.linsys == "sharded":
        from ipx.linsys import schur
        return schur.solve(fac, A, rhs, opts)
    if opts.linsys == "augmented":
        from ipx.linsys import augmented
        return augmented.normal_solve(fac, A, rhs, opts)
    if opts.linsys in ("augmented_schur", "sharded_schur"):
        from ipx.linsys import augmented
        return augmented.normal_solve_schur(fac, A, rhs, opts)

    prec = opts.matmul_precision
    dt = rhs.dtype
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)

    if use_fused_matvec(opts, A):
        from ipx.kernels import fused as fk

        def op_true(v):
            # one A stream: stripe-fused A (d2 (A^T v)) — same HIGHEST-
            # precision contractions as the XLA route, half the HBM traffic
            return fk.ata_apply(A, v, fac.d2, None)[0]
    else:
        def op_true(v):
            # matrix-free through A at HIGHEST: the accuracy reference
            return mv(A, fac.d2 * mv(A.T, v, prec), prec)

    if opts.cg_operator == "assembled":
        # Defect correction: the INITIAL residual is computed matrix-free
        # (it sets the accuracy floor: the CG correction d satisfies
        # y_err = (M_asm^-1 - M_true^-1) r, second-order small since r is
        # already preconditioned-small); the CG recurrences then stream the
        # assembled m x m matrix — 4x less HBM traffic per iteration.
        def op(v):
            return mv(fac.M, v, prec)
    else:
        op = op_true

    def precond(r):
        # (J M J + reg I)^-1 in the original variables: J L^-T L^-1 J r
        return fac.j * _chol_solve(fac, fac.j * r, opts.chol_backend)

    y = precond(rhs)
    if opts.refine_steps <= 0:
        return y
    r = rhs - op_true(y)
    z = precond(r)
    p = z
    rz = jnp.vdot(r, z)
    for i in range(opts.refine_steps):
        Ap = op(p)
        pAp = jnp.vdot(p, Ap)
        # Guards: pAp <= 0 only from rounding at exact convergence —
        # freeze the iteration there instead of dividing by ~0.
        ok = pAp > tiny
        alpha = jnp.where(ok, rz / jnp.where(ok, pAp, jnp.ones((), dt)),
                          jnp.zeros((), dt))
        y = y + alpha * p
        if i == opts.refine_steps - 1:
            # the remaining recurrences (r, z = precond(r), beta, p) feed
            # only a next iteration that doesn't exist — dropping them is
            # bit-identical in y and saves one preconditioner pair-solve
            # (an L + L^T stream) per solve call
            break
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        ok_b = jnp.abs(rz) > tiny
        beta = jnp.where(ok_b, rz_new / jnp.where(ok_b, rz, jnp.ones((), dt)),
                         jnp.zeros((), dt))
        p = z + beta * p
        rz = rz_new
    return y
