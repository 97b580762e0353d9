"""Warm-start API for parametric LP families (re-centered seed point)."""
import numpy as np

import ipx
from ipx.problem.generate import random_feasible_lp


def test_warm_start_reduces_iterations():
    g = random_feasible_lp(60, 120, seed=0)
    opts = ipx.SolverOptions(dtype="float32")
    cold = ipx.solve(g.c, g.A, g.b, options=opts)
    assert cold.optimal

    # perturb the objective slightly (parametric family step)
    rng = np.random.default_rng(1)
    c2 = g.c * (1 + 0.01 * rng.standard_normal(g.c.shape))
    cold2 = ipx.solve(c2, g.A, g.b, options=opts)
    warm2 = ipx.solve(c2, g.A, g.b, options=opts,
                      warm_start=(cold.x, cold.y, cold.s))
    assert warm2.optimal
    rel = abs(warm2.objective - cold2.objective) / (1 + abs(cold2.objective))
    assert rel <= 2e-6
    assert warm2.iterations <= cold2.iterations


def test_warm_start_exact_same_problem():
    g = random_feasible_lp(40, 80, seed=2)
    opts = ipx.SolverOptions(dtype="float32")
    cold = ipx.solve(g.c, g.A, g.b, options=opts)
    warm = ipx.solve(g.c, g.A, g.b, options=opts,
                     warm_start=(cold.x, cold.y, cold.s))
    assert warm.optimal
    assert warm.iterations <= max(6, cold.iterations // 2)
