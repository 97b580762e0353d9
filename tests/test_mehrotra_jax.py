"""Tests for the jit-compiled JAX Mehrotra solver (single instance).

The f32 path is the TPU configuration; the f64 path (CPU only) validates the
algorithm free of rounding.  Oracles: constructed optimum, numpy reference
solver, scipy HiGHS (SURVEY.md §4.2).
"""
import numpy as np
import pytest
from scipy.optimize import linprog

import ipx
from ipx.ipm import reference_numpy as ref
from ipx.problem.generate import random_feasible_lp
from ipx.status import Status


def _solve(g, **opt_kw):
    # presolve=False: this file tests properties of the raw DEVICE iterate
    # (interiority, trace, step-lock); the presolve path postsolves s = c -
    # A^T y host-side, which legitimately rounds zero entries slightly
    # negative.
    opts = ipx.SolverOptions(**opt_kw)
    return ipx.solve(g.c, g.A, g.b, options=opts, presolve=False)


@pytest.mark.parametrize("seed", range(3))
def test_f64_matches_constructed_optimum(seed):
    g = random_feasible_lp(50, 100, seed=seed)
    sol = _solve(g, dtype="float64", tol=1e-9, tol_feas=1e-9)
    assert sol.status == int(Status.OPTIMAL)
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 1e-8


@pytest.mark.parametrize("seed", range(5))
def test_f32_reaches_1e6_gap(seed):
    """The contract's accuracy bar: rel gap <= 1e-6 in the f32 TPU world."""
    g = random_feasible_lp(50, 100, seed=seed)
    sol = _solve(g, dtype="float32")
    assert sol.status == int(Status.OPTIMAL), sol.iteration_table()
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 5e-6
    assert sol.rel_gap <= 1e-6


def test_f32_larger_instance():
    g = random_feasible_lp(128, 256, seed=11)
    sol = _solve(g, dtype="float32")
    assert sol.status == int(Status.OPTIMAL), sol.iteration_table()
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 1e-5


def test_matches_numpy_reference_objective():
    g = random_feasible_lp(40, 90, seed=5)
    npy = ref.solve(g.c, g.A, g.b)
    jx = _solve(g, dtype="float32")
    rel = abs(jx.objective - npy.objective) / (1 + abs(npy.objective))
    assert rel <= 5e-6


def test_matches_scipy_highs():
    g = random_feasible_lp(30, 70, seed=9)
    hi = linprog(g.c, A_eq=g.A, b_eq=g.b, method="highs")
    jx = _solve(g, dtype="float32")
    rel = abs(jx.objective - hi.fun) / (1 + abs(hi.fun))
    assert rel <= 5e-6


def test_iterate_stays_interior():
    g = random_feasible_lp(30, 60, seed=2)
    sol = _solve(g, dtype="float32")
    assert np.all(sol.x > 0)
    assert np.all(sol.s > 0)


def test_trace_mu_decreases():
    g = random_feasible_lp(30, 60, seed=4)
    sol = _solve(g, dtype="float32")
    mus = sol.trace[: sol.iterations, 0]
    assert mus[-1] < 1e-6 * mus[0] + 1e-12


def test_max_iter_status():
    g = random_feasible_lp(30, 60, seed=6)
    sol = _solve(g, dtype="float32", max_iter=2)
    assert sol.status == int(Status.MAX_ITER)
    assert sol.iterations == 2


def test_jit_cache_reuse_same_shapes():
    """Two different instances of identical shape hit the same executable."""
    g1 = random_feasible_lp(20, 40, seed=0)
    g2 = random_feasible_lp(20, 40, seed=1)
    s1 = _solve(g1, dtype="float32")
    s2 = _solve(g2, dtype="float32")
    assert s1.optimal and s2.optimal
    assert abs(s1.objective - s2.objective) > 1e-8  # actually different LPs


def test_gondzio_correctors_reduce_iterations_f64():
    """Gondzio correctors (reusing the factorization) should cut iteration
    counts in f64; measured -18% on the netlib-style suite (see options.py)."""
    total0 = total2 = 0
    for seed in range(3):
        g = random_feasible_lp(60, 120, seed=seed)
        s0 = ipx.solve(g.c, g.A, g.b,
                       options=ipx.SolverOptions(dtype="float64", tol=1e-9))
        s2 = ipx.solve(g.c, g.A, g.b,
                       options=ipx.SolverOptions(dtype="float64", tol=1e-9,
                                                 gondzio_correctors=2))
        assert s0.optimal and s2.optimal
        total0 += s0.iterations
        total2 += s2.iterations
    assert total2 <= total0


def test_refactor_period_converges():
    """refactor_period=2: the stale-factor steps (previous Cholesky as CG
    preconditioner against the FRESH matrix-free operator) must still
    converge to the constructed optimum — at a modest iteration premium,
    not a stall (SolverOptions.refactor_period)."""
    import ipx
    from ipx.problem.generate import random_feasible_lp

    o = ipx.SolverOptions(refactor_period=2, stale_solve_cg=3)
    for seed in (0, 3):
        g = random_feasible_lp(128, 256, seed=seed)
        sol = ipx.solve(g.c, g.A, g.b, presolve=False, options=o)
        assert sol.optimal, sol.status_name
        rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
        assert rel <= 2e-6, f"seed {seed}: rel err {rel:.2e}"
    # guarded invalid combos
    import pytest as _pt
    with _pt.raises(ValueError):
        ipx.SolverOptions(refactor_period=2, cg_operator="assembled")
    with _pt.raises(ValueError):
        ipx.SolverOptions(refactor_period=0)

def test_refactor_period_never_overshoots_max_iter():
    """With refactor_period>1 and max_iter not a multiple of the period, the
    trailing stale steps of the last block must freeze at the cap: iteration
    counts may never exceed max_iter and the trace's last row is written at
    most once (ADVICE r4 low #1).  Checked on single and batched runs."""
    import ipx
    from ipx.problem.generate import random_feasible_lp
    from ipx.problem.lp import make_lp

    o = ipx.SolverOptions(refactor_period=3, stale_solve_cg=3, max_iter=7,
                          augmented_fallback=False)
    g = random_feasible_lp(48, 96, seed=1)
    sol = ipx.solve(g.c, g.A, g.b, presolve=False, options=o)
    assert sol.iterations <= o.max_iter

    lps = [make_lp(*(lambda h: (h.c, h.A, h.b))(random_feasible_lp(
        48, 96, seed=s))) for s in range(3)]
    sols = ipx.solve_batch(lps, options=o)
    for s in sols:
        assert s.iterations <= o.max_iter


def test_batched_no_overshoot_mixed_convergence():
    """A batch mixing an easy instance with one that hits the cap: the
    capped instance must report exactly max_iter iterations even while other
    lanes keep the while_loop alive (step_masked's it<max_iter guard)."""
    import ipx
    from ipx.problem.generate import random_feasible_lp
    from ipx.problem.lp import make_lp

    o = ipx.SolverOptions(max_iter=4, augmented_fallback=False)
    lps = [make_lp(*(lambda h: (h.c, h.A, h.b))(random_feasible_lp(
        48, 96, seed=s))) for s in range(4)]
    sols = ipx.solve_batch(lps, options=o)
    for s in sols:
        assert s.iterations <= o.max_iter
