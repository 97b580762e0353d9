"""chol_backend="blocked": XLA-level blocked right-looking factorization
with co-computed diagonal-block inverses (ipx/linsys/normal_eq.py
_blocked_potrf).  Oracle: numpy float64 Cholesky / direct solve."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ipx
from ipx.linsys import normal_eq
from ipx.kernels import cholesky as pk


def _rand_spd(m, seed, cond=1e3):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    lam = np.logspace(0, -np.log10(cond), m)
    return (Q * lam) @ Q.T


@pytest.mark.parametrize("m", [128, 256, 384])
def test_blocked_potrf_matches_numpy(m):
    M = _rand_spd(m, seed=m).astype(np.float32)
    L, W = normal_eq._blocked_potrf(jnp.asarray(M), pk.NB)
    L_ref = np.linalg.cholesky(M.astype(np.float64))
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=2e-4,
                               atol=2e-5 * np.abs(L_ref).max())
    # W holds inv of the 128-diag-blocks of L
    for k in range(m // pk.NB):
        blk = np.asarray(L)[k * pk.NB:(k + 1) * pk.NB,
                            k * pk.NB:(k + 1) * pk.NB]
        np.testing.assert_allclose(np.asarray(W)[k] @ blk, np.eye(pk.NB),
                                   atol=5e-4)


def test_blocked_potrf_vmap():
    B, m = 3, 256
    Ms = np.stack([_rand_spd(m, seed=7 + b).astype(np.float32)
                   for b in range(B)])
    L, W = jax.vmap(lambda M: normal_eq._blocked_potrf(M, pk.NB))(
        jnp.asarray(Ms))
    assert L.shape == (B, m, m) and W.shape == (B, m // pk.NB, pk.NB, pk.NB)
    for b in range(B):
        ref = np.linalg.cholesky(Ms[b].astype(np.float64))
        np.testing.assert_allclose(np.asarray(L)[b], ref, rtol=2e-4,
                                   atol=2e-5 * np.abs(ref).max())


def test_blocked_factor_solve_roundtrip():
    """normal_eq.factor + solve with the blocked backend solves
    (A D^2 A^T) y = rhs (includes the 128-padding path: m=200)."""
    rng = np.random.default_rng(11)
    m, n = 200, 400
    A = rng.standard_normal((m, n)).astype(np.float32) / np.sqrt(n)
    d2 = np.abs(rng.standard_normal(n)).astype(np.float32) + 0.1
    rhs = rng.standard_normal(m).astype(np.float32)
    opts = ipx.SolverOptions(dtype="float32", chol_backend="blocked",
                             refine_steps=2)
    fac = normal_eq.factor(jnp.asarray(A), jnp.asarray(d2), opts)
    assert bool(fac.ok)
    y = normal_eq.solve(fac, jnp.asarray(A), jnp.asarray(rhs), opts)
    M = (A.astype(np.float64) * d2) @ A.astype(np.float64).T
    y_ref = np.linalg.solve(M, rhs.astype(np.float64))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4,
                               atol=1e-4 * (1 + np.abs(y_ref).max()))


def test_blocked_backend_end_to_end():
    from ipx.problem.generate import random_feasible_lp
    g = random_feasible_lp(96, 192, seed=5)
    sol = ipx.solve(g.c, g.A, g.b, presolve=False,
                    options=ipx.SolverOptions(dtype="float32",
                                              chol_backend="blocked"))
    assert sol.optimal, sol.status_name
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 2e-6, f"rel err {rel:.2e}"


def test_blocked_backend_rejected_for_f64():
    with pytest.raises(ValueError):
        ipx.SolverOptions(dtype="float64", chol_backend="blocked")


@pytest.mark.parametrize("nb,prec", [(256, None), (128, "high")])
def test_blocked_potrf_variants(nb, prec):
    """Wider panels / 3-pass syrk precision: same factor, W stays 128."""
    m = 512
    M = _rand_spd(m, seed=nb).astype(np.float32)
    precision = jax.lax.Precision.HIGH if prec == "high" else None
    L, W = normal_eq._blocked_potrf(jnp.asarray(M), nb, precision)
    L_ref = np.linalg.cholesky(M.astype(np.float64))
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=2e-3,
                               atol=5e-5 * np.abs(L_ref).max())
    assert W.shape == (m // pk.NB, pk.NB, pk.NB)
    for k in range(m // pk.NB):
        blk = np.asarray(L)[k * pk.NB:(k + 1) * pk.NB,
                            k * pk.NB:(k + 1) * pk.NB]
        np.testing.assert_allclose(np.asarray(W)[k] @ blk, np.eye(pk.NB),
                                   atol=5e-4)


def test_blocked_backend_batched():
    import ipx
    from ipx.problem.generate import random_feasible_lp
    from ipx.problem.lp import make_lp
    gs = [random_feasible_lp(96, 192, seed=20 + i) for i in range(3)]
    opts = ipx.SolverOptions(dtype="float32", chol_backend="blocked",
                             matvec_backend="fused")
    sols = ipx.solve_batch([make_lp(g.c, g.A, g.b) for g in gs],
                           options=opts)
    for g, s in zip(gs, sols):
        assert s.optimal, s.status_name
        assert abs(s.objective - g.obj_star) / (1 + abs(g.obj_star)) <= 2e-6


def test_throughput_preset():
    """SolverOptions.throughput() solves exactly (no silent bf16 rounding
    of the user's A) and accepts keyword overrides."""
    import ipx
    from ipx.problem.generate import random_feasible_lp
    opts = ipx.SolverOptions.throughput()
    assert opts.a_storage == "float32"   # presets must not perturb user data
    assert opts.chol_backend == "pallas_left" and opts.proj_cg_iters == 0
    assert opts.refine_solve_cg == 0
    assert ipx.SolverOptions.throughput(refine_steps=2).refine_steps == 2
    g = random_feasible_lp(96, 192, seed=7)
    sol = ipx.solve(g.c, g.A, g.b, options=opts)
    assert sol.optimal, sol.status_name
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 2e-6, rel


def test_refine_solve_cg_direct_sweeps():
    """refine_solve_cg=0 (direct preconditioner apply inside KKT refinement
    sweeps — the bench/throughput config) still reaches the 1e-6 gap."""
    with pytest.raises(ValueError):
        ipx.SolverOptions(refine_solve_cg=-2)
    from ipx.problem.generate import random_feasible_lp
    g = random_feasible_lp(96, 192, seed=9)
    sol = ipx.solve(g.c, g.A, g.b,
                    options=ipx.SolverOptions(dtype="float32",
                                              refine_solve_cg=0))
    assert sol.optimal, sol.status_name
    assert abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star)) <= 2e-6


def test_blocked_left_backend_end_to_end():
    from ipx.problem.generate import random_feasible_lp
    g = random_feasible_lp(96, 192, seed=5)
    sol = ipx.solve(g.c, g.A, g.b, presolve=False,
                    options=ipx.SolverOptions(dtype="float32",
                                              chol_backend="blocked_left"))
    assert sol.optimal, sol.status_name
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 2e-6, f"rel err {rel:.2e}"


def test_blocked_potrf_left_matches_right():
    """Left-looking variant emits the TRANSPOSED factor (LT, W)."""
    m = 512
    M = _rand_spd(m, seed=3).astype(np.float32)
    LT, W = normal_eq._blocked_potrf_left(jnp.asarray(M), 128)
    L_ref = np.linalg.cholesky(M.astype(np.float64))
    np.testing.assert_allclose(np.asarray(LT).T, L_ref, rtol=2e-3,
                               atol=5e-5 * np.abs(L_ref).max())
    assert W.shape == (m // pk.NB, pk.NB, pk.NB)
    for k in range(m // pk.NB):
        blk = np.asarray(LT).T[k * pk.NB:(k + 1) * pk.NB,
                               k * pk.NB:(k + 1) * pk.NB]
        np.testing.assert_allclose(np.asarray(W)[k] @ blk, np.eye(pk.NB),
                                   atol=5e-4)
