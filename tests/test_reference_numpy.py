"""Tests for the float64 numpy reference Mehrotra solver (oracle #1).

Covers BASELINE.json config 1: single small dense LP (m=50, n=100, random
feasible) solved on CPU via the numpy reference path.
"""
import numpy as np
import pytest
from scipy.optimize import linprog

from ipx.ipm import reference_numpy as ref
from ipx.problem.generate import random_feasible_lp
from ipx.status import Status


@pytest.mark.parametrize("seed", range(5))
def test_config1_random_feasible_m50_n100(seed):
    g = random_feasible_lp(50, 100, seed=seed)
    sol = ref.solve(g.c, g.A, g.b)
    assert sol.status == int(Status.OPTIMAL)
    assert sol.rel_gap <= 1e-9
    assert sol.rp_rel <= 1e-9
    # objective matches the constructed optimum
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 1e-8
    assert np.all(sol.x >= 0)


def test_matches_scipy_highs():
    g = random_feasible_lp(30, 80, seed=42)
    sol = ref.solve(g.c, g.A, g.b)
    hi = linprog(g.c, A_eq=g.A, b_eq=g.b, method="highs")
    assert hi.status == 0
    rel = abs(sol.objective - hi.fun) / (1 + abs(hi.fun))
    assert rel <= 1e-8


def test_iteration_count_is_canonical():
    # Mehrotra on well-conditioned random LPs converges in ~6-25 iterations.
    g = random_feasible_lp(50, 100, seed=7)
    sol = ref.solve(g.c, g.A, g.b)
    assert sol.iterations < 30


def test_degenerate_support():
    # fewer positive x* entries than rows: optimal face is degenerate
    g = random_feasible_lp(40, 100, seed=3, support=20)
    sol = ref.solve(g.c, g.A, g.b)
    assert sol.status == int(Status.OPTIMAL)
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 1e-7


def test_trace_recorded():
    g = random_feasible_lp(20, 50, seed=1)
    sol = ref.solve(g.c, g.A, g.b)
    assert len(sol.trace) == sol.iterations + 1
    mus = [t["mu"] for t in sol.trace]
    assert mus[-1] < mus[0]
