"""Structured fuzz battery (VERDICT r1 weak #5 -> next-round #7).

The 30-instance battery referenced by README/commit decddd86: the cross
product of {degenerate supports} x {scale spreads} x {near-square shapes},
all solved through ``ipx.solve`` DEFAULTS (f32, dense normal equations,
automatic augmented fallback) and checked against the constructed optimum.
Degenerate supports (support < m) hit the sqrt(eps) conditioning floor of
the normal equations; the two-stage augmented fallback is what makes these
pass at 1e-6 (ipx/linsys/augmented.py).
"""
import numpy as np
import pytest

import ipx
from ipx.problem.generate import random_feasible_lp

# 3 shapes x 2 supports x 5 scale/seed combos = 30 instances
SHAPES = [(40, 80), (56, 64), (50, 55)]          # incl. near-square
SUPPORTS = ["full", "degenerate"]                # support=m vs support=3m/4
SCALE_SEEDS = [(0.0, 0), (0.0, 1), (1.0, 2), (1.5, 3), (2.0, 4)]

CASES = [(m, n, sup, spread, seed)
         for (m, n) in SHAPES
         for sup in SUPPORTS
         for (spread, seed) in SCALE_SEEDS]
assert len(CASES) == 30


@pytest.mark.parametrize("m,n,sup,spread,seed", CASES)
def test_fuzz_battery(m, n, sup, spread, seed):
    support = m if sup == "full" else (3 * m) // 4
    g = random_feasible_lp(m, n, seed=seed, support=support,
                           scale_spread=spread)
    sol = ipx.solve(g.c, g.A, g.b)   # library defaults, f32
    assert sol.optimal, (
        f"{sol.status_name} at m={m} n={n} {sup} spread={spread} seed={seed}")
    # the contract metric (BASELINE.json:2) is rel gap <= 1e-6
    assert sol.rel_gap <= 1e-6, f"rel gap {sol.rel_gap:.2e}"
    # Objective error vs the constructed optimum is a STRICTER check than
    # the rel-gap contract: postsolve multiplies the f32 solution by the
    # Ruiz column scales, so rounding is amplified by the scale spread
    # (observed floor: ~1.0e-6 at spread 0, up to ~6.4e-6 at spread 1.5 on
    # degenerate near-square instances; f64 reaches 4e-9 on the same
    # instances).  Tolerance grows with the spread.
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    tol_obj = 2e-6 + 5e-6 * spread
    assert rel <= tol_obj, f"rel err {rel:.2e} (tol {tol_obj:.1e})"
