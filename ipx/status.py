"""Solver status codes (shared between the JAX and numpy paths)."""
from __future__ import annotations

import enum


class Status(enum.IntEnum):
    RUNNING = 0
    OPTIMAL = 1
    MAX_ITER = 2
    NUMERICAL_FAILURE = 3
    # Heuristic certificates (divergence-based; a pedagogical IPM has no
    # rigorous infeasibility detection and neither does the reference class,
    # SURVEY.md §2.1 R11):
    PRIMAL_INFEASIBLE = 4
    DUAL_INFEASIBLE = 5
    # mu hit the dtype floor before all tolerances were met; the best iterate
    # visited is reported (f32 accuracy limit, SURVEY.md §7 hard part 1).
    STALLED = 6


STATUS_NAMES = {int(s): s.name for s in Status}
