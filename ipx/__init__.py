"""ipx — TPU-native interior-point LP solver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo ``payakorn/InteriorPointMethod`` (see SURVEY.md): Mehrotra
predictor-corrector as a jit-compiled fixed-shape iteration, normal-equations
KKT solves via batched Cholesky, fused ratio-test/residual reductions, and
batch/row-sharded scaling over TPU meshes.
"""
from ipx.options import SolverOptions, DEFAULT_OPTIONS
from ipx.status import Status
from ipx.problem.lp import LP, GeneralLP, make_lp, to_standard_form
from ipx.api import (Solution, solve, solve_batch, solve_general, solve_mps,
                     solve_large, solve_many)

__version__ = "0.1.0"

__all__ = [
    "SolverOptions", "DEFAULT_OPTIONS", "Status", "LP", "GeneralLP",
    "make_lp", "to_standard_form", "Solution", "solve", "solve_batch",
    "solve_general", "solve_mps", "solve_large", "solve_many",
]
