"""End-to-end solver tests with chol_backend="pallas" (interpret mode on CPU).

Validates the full IPM running on the Pallas factorization/solve path —
including the 128-padding of non-multiple m, vmap batching over pallas_call,
and agreement with the XLA backend (SURVEY.md §4.2).
"""
import numpy as np
import pytest

import ipx
from ipx.problem.generate import random_feasible_lp
from ipx.problem.lp import make_lp
from ipx.status import Status


@pytest.mark.parametrize("m,n", [(50, 100), (128, 256)])
def test_single_solve_pallas_backend(m, n):
    g = random_feasible_lp(m, n, seed=0)
    opts = ipx.SolverOptions(dtype="float32", chol_backend="pallas")
    sol = ipx.solve(g.c, g.A, g.b, options=opts)
    assert sol.status == int(Status.OPTIMAL), sol.iteration_table()
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 5e-6


def test_pallas_agrees_with_xla_backend():
    g = random_feasible_lp(60, 120, seed=7)
    a = ipx.solve(g.c, g.A, g.b,
                  options=ipx.SolverOptions(dtype="float32", chol_backend="xla"))
    p = ipx.solve(g.c, g.A, g.b,
                  options=ipx.SolverOptions(dtype="float32", chol_backend="pallas"))
    rel = abs(a.objective - p.objective) / (1 + abs(a.objective))
    assert rel <= 2e-6


def test_batched_solve_pallas_backend():
    gs = [random_feasible_lp(40, 80, seed=s) for s in range(3)]
    lps = [make_lp(g.c, g.A, g.b) for g in gs]
    opts = ipx.SolverOptions(dtype="float32", chol_backend="pallas")
    sols = ipx.solve_batch(lps, options=opts)
    for g, sol in zip(gs, sols):
        assert sol.status == int(Status.OPTIMAL), sol.iteration_table()
        rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
        assert rel <= 5e-6


def test_fused_pcg_path():
    """chol_backend=pallas + cg_operator=assembled -> the fused PCG kernel."""
    g = random_feasible_lp(70, 140, seed=11)
    opts = ipx.SolverOptions(dtype="float32", chol_backend="pallas",
                             cg_operator="assembled")
    sol = ipx.solve(g.c, g.A, g.b, options=opts)
    assert sol.status == int(Status.OPTIMAL), sol.iteration_table()
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 5e-6


def test_fused_pcg_batched():
    gs = [random_feasible_lp(40, 80, seed=s) for s in range(3)]
    lps = [make_lp(g.c, g.A, g.b) for g in gs]
    opts = ipx.SolverOptions(dtype="float32", chol_backend="pallas",
                             cg_operator="assembled")
    sols = ipx.solve_batch(lps, options=opts)
    for g, sol in zip(gs, sols):
        assert sol.status == int(Status.OPTIMAL)
        rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
        assert rel <= 5e-6
