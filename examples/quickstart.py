"""ipx quickstart: the main API surfaces in one script.

Run: python examples/quickstart.py [--platform cpu]
"""
import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--platform", default=None)
args = p.parse_args()
if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)

import numpy as np
import ipx
from ipx.problem.generate import random_feasible_lp, random_general_lp
from ipx.problem.lp import make_lp

# --- 1. standard-form solve (min c@x, Ax=b, x>=0) --------------------------
g = random_feasible_lp(100, 200, seed=0)     # known optimum g.obj_star
sol = ipx.solve(g.c, g.A, g.b)
print(f"[single]   {sol.status_name} in {sol.iterations} iters, "
      f"obj {sol.objective:.6f} (known {g.obj_star:.6f})")

# --- 2. general form: inequalities + bounds + presolve pipeline ------------
glp = random_general_lp(seed=1)
gsol = ipx.solve_general(glp)
print(f"[general]  {gsol.status_name} in {gsol.iterations} iters, "
      f"obj {gsol.objective:.6f}")

# --- 3. batch of LPs in one device program ---------------------------------
gs = [random_feasible_lp(60, 120, seed=s) for s in range(4)]
sols = ipx.solve_batch([make_lp(x.c, x.A, x.b) for x in gs])
print(f"[batch]    {sum(s.optimal for s in sols)}/4 optimal, iters "
      f"{[s.iterations for s in sols]}")

# --- 4. warm start a parametric family -------------------------------------
c2 = g.c * 1.01
warm = ipx.solve(c2, g.A, g.b, warm_start=(sol.x, sol.y, sol.s))
print(f"[warm]     {warm.status_name} in {warm.iterations} iters "
      f"(cold took ~{sol.iterations})")

# --- 5. checkpoint / resume ------------------------------------------------
import tempfile
with tempfile.TemporaryDirectory() as d:
    ck = os.path.join(d, "state.npz")
    part = ipx.solve(g.c, g.A, g.b,
                     options=ipx.SolverOptions(max_iter=3), checkpoint_to=ck)
    res = ipx.solve(g.c, g.A, g.b, resume_from=ck)
    print(f"[resume]   capped run: {part.status_name}; resumed: "
          f"{res.status_name} at iter {res.iterations}")

# --- 6. per-iteration trace ------------------------------------------------
print("\nIteration trace of the first solve:")
print(sol.iteration_table())
