"""Tests for the vmap'd batched solver (SURVEY.md component N12, config 3).

Key property: batch[i] result == single-solve result (vmap-consistency,
SURVEY.md §4.2 "Integration: batched"), plus per-instance convergence
masking — a hard instance must not perturb an easy instance's solution.
"""
import numpy as np
import pytest

import ipx
from ipx.ipm import batched
from ipx.problem.generate import random_feasible_lp
from ipx.problem.lp import make_lp
from ipx.status import Status


def _batch(ms, ns, seeds):
    gs = [random_feasible_lp(m, n, seed=s) for m, n, s in zip(ms, ns, seeds)]
    lps = [make_lp(g.c, g.A, g.b) for g in gs]
    return gs, lps


def test_stack_rejects_mixed_shapes():
    _, lps = _batch([10, 12], [20, 20], [0, 1])
    with pytest.raises(ValueError):
        batched.stack_lps(lps)


def test_stack_rejects_empty():
    with pytest.raises(ValueError):
        batched.stack_lps([])


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_batch_matches_constructed_optima(dtype):
    gs, lps = _batch([30] * 4, [60] * 4, range(4))
    opts = ipx.SolverOptions(dtype=dtype)
    sols = ipx.solve_batch(lps, options=opts)
    assert len(sols) == 4
    for g, sol in zip(gs, sols):
        assert sol.status == int(Status.OPTIMAL), sol.iteration_table()
        rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
        assert rel <= 5e-6


def test_batch_consistent_with_single_solve():
    gs, lps = _batch([25] * 3, [50] * 3, [10, 11, 12])
    opts = ipx.SolverOptions(dtype="float32")
    bsols = ipx.solve_batch(lps, options=opts)
    for g, bsol in zip(gs, bsols):
        ssol = ipx.solve(g.c, g.A, g.b, options=opts)
        # Identical program modulo vmap batching; objectives must agree to
        # well under the convergence tolerance.
        rel = abs(bsol.objective - ssol.objective) / (1 + abs(ssol.objective))
        assert rel <= 2e-6
        assert bsol.status == ssol.status


def test_converged_instances_frozen_while_slow_one_runs():
    """An easy and a deliberately harder instance in one batch: the easy
    instance's iteration count must match its solo run (the masking froze it
    rather than letting extra steps perturb it)."""
    easy = random_feasible_lp(60, 120, seed=5)
    hard = random_feasible_lp(60, 120, seed=4, scale_spread=1.0)
    opts = ipx.SolverOptions(dtype="float32")
    lps = [make_lp(g.c, g.A, g.b) for g in (easy, hard)]
    bsols = ipx.solve_batch(lps, options=opts)
    # presolve=False: comparing iteration counts of the raw DEVICE paths
    # (batch member vs single); the presolve route follows a different
    # (Ruiz-scaled, reduced) trajectory.
    solo = ipx.solve(easy.c, easy.A, easy.b, options=opts, presolve=False)
    # Not bitwise: XLA's batched cholesky/matmul kernels round differently
    # than their unbatched forms, so the trajectories differ in the last
    # ulps and convergence can land one iteration apart.
    assert abs(bsols[0].iterations - solo.iterations) <= 1
    rel = abs(bsols[0].objective - solo.objective) / (1 + abs(solo.objective))
    assert rel <= 2e-6


def test_batched_lp_prestacked_input():
    gs, lps = _batch([20] * 2, [40] * 2, [7, 8])
    blp = batched.stack_lps(lps)
    sols = ipx.solve_batch(blp, options=ipx.SolverOptions(dtype="float32"))
    for g, sol in zip(gs, sols):
        rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
        assert rel <= 5e-6


def test_run_batch_fixed_iters_advances():
    gs, lps = _batch([16] * 2, [32] * 2, [1, 2])
    blp = batched.stack_lps(lps)
    opts = ipx.SolverOptions(dtype="float32")
    st0, fac_aat = batched.batch_starting_state(blp, opts)
    st5 = batched.run_batch_fixed_iters(blp, st0, 5, opts, fac_aat)
    assert int(st5.it[0]) == 5
    assert float(st5.mu[0]) < float(np.asarray(st0.mu0[0]))


# ---------------------------------------------------------------------------
# solve_many: API-level bucketed solving of mixed-size workloads
# (SURVEY.md §2.2 EP row; VERDICT r1 item 8)
# ---------------------------------------------------------------------------

def test_solve_many_mixed_sizes():
    import ipx
    from ipx.problem.generate import random_feasible_lp
    shapes = [(20, 40), (24, 50), (30, 60), (48, 96), (10, 30), (20, 40)]
    gs = [random_feasible_lp(m, n, seed=i) for i, (m, n) in enumerate(shapes)]
    sols = ipx.solve_many([(g.c, g.A, g.b) for g in gs])
    assert len(sols) == len(gs)
    for i, (g, s) in enumerate(zip(gs, sols)):
        assert s.optimal, f"instance {i}: {s.status_name}"
        # shapes are back in ORIGINAL units and input order
        assert s.x.shape == (g.A.shape[1],)
        assert s.y.shape == (g.A.shape[0],)
        rel = abs(s.objective - g.obj_star) / (1 + abs(g.obj_star))
        assert rel <= 2e-6, f"instance {i}: rel err {rel:.2e}"
        assert s.rp_rel <= 1e-4


def test_solve_many_accepts_lp_objects():
    import ipx
    from ipx.problem.generate import random_feasible_lp
    from ipx.problem.lp import make_lp
    gs = [random_feasible_lp(16, 32, seed=9), random_feasible_lp(40, 80, seed=10)]
    sols = ipx.solve_many([make_lp(g.c, g.A, g.b) for g in gs])
    for g, s in zip(gs, sols):
        assert s.optimal
        assert abs(s.objective - g.obj_star) / (1 + abs(g.obj_star)) <= 2e-6
