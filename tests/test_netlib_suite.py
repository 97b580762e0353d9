"""Netlib-style 20-LP suite (BASELINE.json config 2; SURVEY.md §3.4).

Twenty small/medium general LPs — equalities, inequalities, finite bounds,
free variables, ill-scaled instances — run through the FULL pipeline
(standard-form conversion -> presolve + Ruiz -> f32 device IPM -> postsolve)
and checked against scipy's HiGHS to the contract tolerance: rel gap <= 1e-6
(BASELINE.json:2).  The f32 path is the TPU configuration.
"""
import numpy as np
import pytest
from scipy.optimize import linprog

import ipx
from ipx.problem.generate import random_general_lp

# 20 instances with varied shapes/features; scale_spread > 0 exercises Ruiz.
SUITE = [
    dict(seed=0),
    dict(seed=1, n=30, m_eq=5, m_ub=15),
    dict(seed=2, n=60, m_eq=12, m_ub=30),
    dict(seed=3, n_free=0),
    dict(seed=4, n_free=5),
    dict(seed=5, scale_spread=1.5),
    dict(seed=6, scale_spread=2.5),
    dict(seed=7, n=80, m_eq=20, m_ub=40),
    dict(seed=8, n=25, m_eq=2, m_ub=40),
    dict(seed=9, n=50, m_eq=15, m_ub=10),
    dict(seed=10, scale_spread=1.0, n_free=4),
    dict(seed=11, n=100, m_eq=25, m_ub=50),
    dict(seed=12, n=35, m_eq=8, m_ub=18, scale_spread=2.0),
    dict(seed=13, n=45, m_eq=10, m_ub=22, n_free=6),
    dict(seed=14, n=70, m_eq=18, m_ub=35),
    dict(seed=15, n=28, m_eq=6, m_ub=12, scale_spread=3.0),
    dict(seed=16, n=55, m_eq=14, m_ub=28, n_free=3),
    dict(seed=17, n=90, m_eq=22, m_ub=45, scale_spread=1.0),
    dict(seed=18, n=32, m_eq=7, m_ub=16),
    dict(seed=19, n=65, m_eq=16, m_ub=32, n_free=8, scale_spread=0.5),
]


def _highs(glp):
    return linprog(glp.c, A_ub=glp.A_ub, b_ub=glp.b_ub,
                   A_eq=glp.A_eq, b_eq=glp.b_eq,
                   bounds=list(zip(glp.lb, glp.ub)), method="highs")


@pytest.mark.parametrize("cfg", SUITE, ids=lambda c: f"synth{c['seed']}")
def test_netlib_style_f32(cfg):
    glp = random_general_lp(**cfg)
    ref = _highs(glp)
    assert ref.status == 0, f"oracle not optimal: {ref.status}"
    # tol is the INTERNAL complementarity-gap certificate; certifying the
    # objective against an external oracle to 1e-6 needs a modest margin
    # (gap and objective error agree only to a constant factor).
    sol = ipx.solve_general(glp, ipx.SolverOptions(dtype="float32", tol=5e-7))
    assert sol.optimal, (sol.status_name, sol.iteration_table())
    rel = abs(sol.objective - ref.fun) / (1 + abs(ref.fun))
    assert rel <= 1e-6, f"rel obj err {rel:.2e}"
    # postsolved feasibility in original units
    viol_ub = (glp.A_ub @ sol.x - glp.b_ub).max(initial=0.0)
    viol_eq = np.abs(glp.A_eq @ sol.x - glp.b_eq).max(initial=0.0)
    scale = 1 + max(np.abs(glp.b_ub).max(initial=0.0),
                    np.abs(glp.b_eq).max(initial=0.0))
    assert viol_ub <= 1e-5 * scale
    assert viol_eq <= 1e-5 * scale
    assert np.all(sol.x >= glp.lb - 1e-5)
    assert np.all(sol.x <= glp.ub + 1e-5)
