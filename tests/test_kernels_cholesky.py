"""Unit tests for the Pallas batched Cholesky/TRSM kernels (SURVEY.md §4.2
"Unit: kernels").  On CPU the kernels run in Pallas interpret mode — the same
kernel code that compiles via Mosaic on TPU.

Oracles: numpy.linalg.cholesky and scipy solves, f32 tolerances.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ipx.kernels import cholesky as pk


def _random_spd(rng, b, m, cond=100.0):
    """Batch of SPD matrices with controlled conditioning."""
    out = np.empty((b, m, m), np.float64)
    for i in range(b):
        Q, _ = np.linalg.qr(rng.standard_normal((m, m)))
        eigs = np.geomspace(1.0, 1.0 / cond, m)
        out[i] = (Q * eigs) @ Q.T
    return out


@pytest.mark.parametrize("b,m", [(1, 128), (3, 256), (2, 384)])
def test_cholesky_matches_numpy(b, m):
    rng = np.random.default_rng(0)
    M = _random_spd(rng, b, m)
    L, W = pk.cholesky_batched(jnp.asarray(M, jnp.float32))
    L = np.asarray(L, np.float64)
    for i in range(b):
        ref = np.linalg.cholesky(M[i])
        # reconstruction error is the meaningful f32 metric
        rec = L[i] @ L[i].T
        assert np.abs(rec - M[i]).max() <= 1e-4 * np.abs(M[i]).max()
        np.testing.assert_allclose(L[i], ref, rtol=5e-3, atol=5e-4)
        # strict upper triangle is exactly zero
        assert np.all(np.triu(L[i], 1) == 0)


def test_diag_block_inverses():
    rng = np.random.default_rng(1)
    m = 256
    M = _random_spd(rng, 1, m)
    L, W = pk.cholesky_batched(jnp.asarray(M, jnp.float32))
    L = np.asarray(L, np.float64)
    W = np.asarray(W, np.float64)
    for k in range(m // pk.NB):
        o = k * pk.NB
        blk = L[0, o:o + pk.NB, o:o + pk.NB]
        err = np.abs(W[0, k] @ blk - np.eye(pk.NB)).max()
        assert err <= 5e-4


@pytest.mark.parametrize("m", [128, 384])
def test_chol_solve_batched(m):
    rng = np.random.default_rng(2)
    b = 2
    M = _random_spd(rng, b, m, cond=50.0)
    x_true = rng.standard_normal((b, m))
    rhs = np.einsum("bij,bj->bi", M, x_true)
    L, W = pk.cholesky_batched(jnp.asarray(M, jnp.float32))
    x = np.asarray(
        pk.chol_solve_batched(L, W, jnp.asarray(rhs, jnp.float32)),
        np.float64)
    rel = np.abs(x - x_true).max() / np.abs(x_true).max()
    assert rel <= 5e-3   # single f32 solve, cond=50


@pytest.mark.parametrize("m", [128, 384])
def test_chol_solve_batched_lt(m):
    """Production entry point: solve from the TRANSPOSED factor only."""
    rng = np.random.default_rng(7)
    b = 2
    M = _random_spd(rng, b, m, cond=50.0)
    x_true = rng.standard_normal((b, m))
    rhs = np.einsum("bij,bj->bi", M, x_true)
    L, W = pk.cholesky_batched(jnp.asarray(M, jnp.float32))
    LT = jnp.swapaxes(L, -1, -2)
    x = np.asarray(
        pk.chol_solve_batched_lt(LT, W, jnp.asarray(rhs, jnp.float32)),
        np.float64)
    rel = np.abs(x - x_true).max() / np.abs(x_true).max()
    assert rel <= 5e-3

    # under vmap: collapses to the kernel batch axis
    xv = np.asarray(jax.vmap(pk.chol_solve_batched_lt)(
        LT[:, None], W[:, None],
        jnp.asarray(rhs, jnp.float32)[:, None])[:, 0], np.float64)
    np.testing.assert_allclose(xv, x, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("m,b", [(128, 2), (256, 3), (1024, 8)])
def test_chol_solve_pair_pipeline_matches(m, b):
    """The pipelined (double-buffered DMA) pair-solve kernel is algebraically
    identical to the start-wait kernel — results must match bitwise.

    CI limitation (ADVICE r2 #2): off-TPU this runs in Pallas interpret
    mode, where DMA start/wait is synchronous — so only the indexing/masking
    algebra is exercised here, NOT the WAR/overlap hazards of the
    double-buffered schedule.  The real-hazard coverage is the on-hardware
    run of this same test (the suite is executed on the TPU chip each
    round) plus the convergence probes in bench.py, which route every
    solve through the pipelined kernel on real DMA."""
    rng = np.random.default_rng(11)
    M = _random_spd(rng, b, m, cond=50.0)
    rhs = rng.standard_normal((b, m))
    L, W = pk.cholesky_batched(jnp.asarray(M, jnp.float32))
    LT = jnp.swapaxes(L, -1, -2)
    x_pipe = np.asarray(pk._chol_solve_pair_lt_impl(
        LT, W, jnp.asarray(rhs, jnp.float32), pipeline=True))
    x_ref = np.asarray(pk._chol_solve_pair_lt_impl(
        LT, W, jnp.asarray(rhs, jnp.float32), pipeline=False))
    np.testing.assert_array_equal(x_pipe, x_ref)


@pytest.mark.parametrize("b,m", [(1, 128), (3, 256), (2, 512)])
def test_factor_lt_matches_numpy(b, m):
    """Kernel-resident left-looking factor: LT = L^T and W = inv(L_kk)."""
    rng = np.random.default_rng(21)
    M = _random_spd(rng, b, m)
    LT, W = pk.factor_lt_batched(jnp.asarray(M, jnp.float32))
    LT = np.asarray(LT, np.float64)
    W = np.asarray(W, np.float64)
    for i in range(b):
        ref = np.linalg.cholesky(M[i])
        np.testing.assert_allclose(LT[i].T, ref, rtol=5e-3, atol=5e-4)
        assert np.all(np.tril(LT[i], -1) == 0)     # strict lower exactly 0
        for k in range(m // pk.NB):
            o = k * pk.NB
            err = np.abs(W[i, k] @ ref[o:o + pk.NB, o:o + pk.NB]
                         - np.eye(pk.NB)).max()
            assert err <= 5e-4


def test_factor_lt_ill_conditioned_endgame():
    """The factor must stay finite and useful on endgame-style spectra
    (the f32 stress case that killed the Neumann-product inversion)."""
    rng = np.random.default_rng(22)
    M = _random_spd(rng, 2, 256, cond=1e6)
    LT, W = pk.factor_lt_batched(jnp.asarray(M, jnp.float32))
    LT = np.asarray(LT, np.float64)
    assert np.all(np.isfinite(LT)) and np.all(np.isfinite(np.asarray(W)))
    # reconstruction through the factor: LT^T LT ~ M
    for i in range(2):
        rec = LT[i].T @ LT[i]
        assert np.abs(rec - M[i]).max() <= 1e-4 * np.abs(M[i]).max()


def test_factor_lt_feeds_pair_solve():
    """The factor's native output layout drives chol_solve_batched_lt with
    no transpose anywhere — the production (factor -> solve) composition."""
    rng = np.random.default_rng(23)
    b, m = 2, 384
    M = _random_spd(rng, b, m, cond=50.0)
    x_true = rng.standard_normal((b, m))
    rhs = np.einsum("bij,bj->bi", M, x_true)
    LT, W = pk.factor_lt_batched(jnp.asarray(M, jnp.float32))
    x = np.asarray(pk.chol_solve_batched_lt(
        LT, W, jnp.asarray(rhs, jnp.float32)), np.float64)
    rel = np.abs(x - x_true).max() / np.abs(x_true).max()
    assert rel <= 5e-3

    # under vmap: collapses to the kernel batch axis
    LTv, Wv = jax.vmap(pk.factor_lt_batched)(
        jnp.asarray(M, jnp.float32)[:, None])
    np.testing.assert_array_equal(np.asarray(LTv[:, 0]), np.asarray(LT))
    np.testing.assert_array_equal(np.asarray(Wv[:, 0]), np.asarray(W))


def test_solve_lower_vs_scipy():
    from scipy.linalg import solve_triangular
    rng = np.random.default_rng(3)
    m = 256
    M = _random_spd(rng, 1, m)
    L, W = pk.cholesky_batched(jnp.asarray(M, jnp.float32))
    b = rng.standard_normal((1, m))
    y = np.asarray(pk.solve_triangular_batched(L, W, jnp.asarray(b, jnp.float32),
                                               lower=True), np.float64)
    ref = solve_triangular(np.asarray(L[0], np.float64), b[0], lower=True)
    np.testing.assert_allclose(y[0], ref, rtol=1e-3, atol=1e-4)


def test_cholesky_single_wrapper():
    rng = np.random.default_rng(4)
    M = _random_spd(rng, 1, 128)[0]
    L = np.asarray(pk.cholesky(jnp.asarray(M, jnp.float32)), np.float64)
    rec = L @ L.T
    assert np.abs(rec - M).max() <= 1e-4 * np.abs(M).max()


def test_rejects_non_multiple_of_128():
    with pytest.raises(AssertionError):
        pk.cholesky_batched(jnp.eye(100)[None])


def test_diag_block_inverse_ill_conditioned():
    """The in-kernel trtri-style inversion must stay accurate on the
    ill-conditioned endgame blocks that broke the round-1 nilpotent product
    (VERDICT r1 weak #2): diagonal entries spanning ~1e8 of dynamic range,
    the f32 IPM endgame regime."""
    import numpy as np
    import jax.numpy as jnp
    from ipx.kernels import cholesky as pk

    rng = np.random.default_rng(0)
    m = pk.NB
    # SPD matrix with violently mixed scales: D^(1/2) R R^T D^(1/2)
    d = 10.0 ** rng.uniform(-4, 4, m)
    R = rng.standard_normal((m, m)) * 0.1 + np.eye(m)
    M = (R @ R.T) * np.outer(np.sqrt(d), np.sqrt(d))
    M = 0.5 * (M + M.T) + 1e-6 * np.diag(d)
    L64 = np.linalg.cholesky(M)
    Lk, Wk = pk.cholesky_batched(jnp.asarray(M[None], jnp.float32))
    W = np.asarray(Wk)[0, 0]
    # W must invert the f32 factor to near-eps relative residual
    Lf = np.asarray(Lk)[0].astype(np.float64)
    resid = np.abs(W.astype(np.float64) @ Lf - np.eye(m)).max()
    assert resid < 5e-4, f"|W L - I| = {resid:.2e}"
    # and the full solve must be BACKWARD stable: the residual stays at
    # f32 rounding level even though the forward error is O(cond * eps)
    x_true = rng.standard_normal(m)
    b = M @ x_true
    x = np.asarray(pk.chol_solve_batched(Lk, Wk, jnp.asarray(b[None], jnp.float32)))[0]
    resid_rel = (np.abs(M @ x.astype(np.float64) - b).max()
                 / (np.abs(M).max() * np.abs(x).max()))
    assert resid_rel < 1e-5, f"solve residual {resid_rel:.2e}"


def test_factor_fused_panels_matches_oracle():
    """Fused assemble+factor (bf16 A, in-kernel split3 + Jacobi scaling +
    per-instance reg) matches the f64 assemble->scale->factor oracle."""
    rng = np.random.default_rng(31)
    B, m, n = 2, 256, 384
    A32 = (rng.standard_normal((B, m, n)) / np.sqrt(n)).astype(np.float32)
    Abf = jnp.asarray(A32).astype(jnp.bfloat16)
    d2 = jnp.asarray(rng.uniform(0.01, 100.0, (B, n)).astype(np.float32))
    Af = np.asarray(Abf, np.float64)
    Mref = np.einsum("bij,bj,bkj->bik", Af, np.asarray(d2, np.float64), Af)
    jref = 1.0 / np.sqrt(np.einsum("bii->bi", Mref))
    # DISTINCT per-instance regs — the batched route escalates reg_boost
    # per instance, so the kernel must not share instance 0's value
    regs = np.array([1e-8, 1e-4])
    Msc = (Mref * jref[:, :, None] * jref[:, None, :]
           + regs[:, None, None] * np.eye(m))
    Lref = np.linalg.cholesky(Msc)
    panels, W = pk.factor_fused_panels(
        Abf, d2, jnp.asarray(jref, jnp.float32),
        jnp.asarray(regs, jnp.float32))
    for k, p in enumerate(panels):
        o = k * pk.NB
        ref = Lref[:, o:, o:o + pk.NB].swapaxes(1, 2)
        err = np.abs(np.asarray(p, np.float64) - ref).max()
        assert err < 5e-4, (k, err)
    # and the solve path composes
    xt = rng.standard_normal((B, m))
    rhs = np.einsum("bij,bj->bi", Msc, xt)
    x = np.asarray(pk.chol_solve_batched_panels(
        panels, W, jnp.asarray(rhs, jnp.float32)), np.float64)
    assert np.abs(x - xt).max() / np.abs(xt).max() <= 5e-3


def test_assemble_sym_batched_matches_oracle():
    """Whole-A-resident symmetric assembly kernel: exact split3 accuracy
    and exact symmetry (diagonal tiles are symmetrized in-kernel)."""
    rng = np.random.default_rng(41)
    B, m, n = 3, 256, 384
    A32 = (rng.standard_normal((B, m, n)) / np.sqrt(n)).astype(np.float32)
    Abf = jnp.asarray(A32).astype(jnp.bfloat16)
    d2 = jnp.asarray(rng.uniform(0.01, 100.0, (B, n)).astype(np.float32))
    assert pk.assemble_fits_kernel(m, n, 2)
    M = np.asarray(pk.assemble_sym_batched(Abf, d2), np.float64)
    Af = np.asarray(Abf, np.float64)
    Mref = np.einsum("bij,bj,bkj->bik", Af, np.asarray(d2, np.float64), Af)
    rel = np.abs(M - Mref).max() / np.abs(Mref).max()
    assert rel <= 5e-7
    assert np.array_equal(M, np.swapaxes(M, 1, 2))
    # gate rejects what cannot hold A+M in VMEM
    assert not pk.assemble_fits_kernel(4096, 8192, 2)
    assert not pk.assemble_fits_kernel(100, 384, 2)
