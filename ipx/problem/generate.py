"""Random feasible LP generation with a known optimal solution.

TPU-native counterpart of the reference's random-feasible generator
(reference component R12, SURVEY.md §2.1/§3.3): sample a strictly
complementary primal-dual pair (x*, y*, s*) and construct (b, c) from it, so
the optimal objective c@x* is known by construction and serves as a test
oracle (BASELINE.json config 1: "random feasible").
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class GeneratedLP:
    c: np.ndarray
    A: np.ndarray
    b: np.ndarray
    x_star: np.ndarray
    y_star: np.ndarray
    s_star: np.ndarray
    obj_star: float


def random_feasible_lp(
    m: int,
    n: int,
    seed: int = 0,
    support: int | None = None,
    scale_spread: float = 0.0,
) -> GeneratedLP:
    """Generate a dense standard-form LP with a known optimum.

    Construction: A ~ N(0, 1/n); pick a support P of size ``support``
    (default m, a nondegenerate vertex); x*_P > 0, x*_N = 0; s*_N > 0,
    s*_P = 0; y* ~ N(0,1). Then b = A x*, c = A^T y* + s*. Strict
    complementarity => c@x* = b@y* is the unique optimal value.

    ``scale_spread`` > 0 multiplies rows/cols by 10**U(-spread, spread) to
    produce badly scaled instances for the Ruiz-equilibration tests.
    """
    rng = np.random.default_rng(seed)
    if support is None:
        support = m
    support = min(support, n)

    A = rng.standard_normal((m, n)) / np.sqrt(n)
    if scale_spread > 0:
        A *= 10.0 ** rng.uniform(-scale_spread, scale_spread, size=(m, 1))
        A *= 10.0 ** rng.uniform(-scale_spread, scale_spread, size=(1, n))

    perm = rng.permutation(n)
    P = perm[:support]
    N = perm[support:]

    x_star = np.zeros(n)
    x_star[P] = rng.uniform(0.5, 2.0, size=support)
    s_star = np.zeros(n)
    s_star[N] = rng.uniform(0.5, 2.0, size=n - support)
    y_star = rng.standard_normal(m)

    b = A @ x_star
    c = A.T @ y_star + s_star
    obj_star = float(c @ x_star)
    return GeneratedLP(c=c, A=A, b=b, x_star=x_star, y_star=y_star,
                       s_star=s_star, obj_star=obj_star)


def random_feasible_batch(batch: int, m: int, n: int, seed: int = 0,
                          **kw) -> list[GeneratedLP]:
    """A list of independent instances (stacked by the caller)."""
    return [random_feasible_lp(m, n, seed=seed + i, **kw) for i in range(batch)]


def random_general_lp(seed: int = 0, n: int = 40, m_eq: int = 8,
                      m_ub: int = 20, n_free: int = 2,
                      scale_spread: float = 0.0):
    """Netlib-style general LP: inequalities + equalities + finite bounds +
    a few free variables, feasible and bounded by construction.

    Used as the in-repo stand-in for BASELINE config 2's "Netlib-style suite
    of 20 small/medium LPs" (no network access: real Netlib files can be fed
    through ipx.solve_mps, but CI needs self-contained instances).

    Construction: bounded variables get finite [lb, ub] (=> bounded LP);
    an interior point x0 gives feasible rhs.  Each free variable is pinned by
    one extra equality  f - a @ x_bounded = r  so it stays bounded while
    exercising the free-variable split in to_standard_form.
    """
    from ipx.problem.lp import GeneralLP

    rng = np.random.default_rng(seed)
    nb = n - n_free
    lb = rng.uniform(-5.0, 0.0, nb)
    ub = lb + rng.uniform(1.0, 10.0, nb)
    x0b = lb + (ub - lb) * rng.uniform(0.2, 0.8, nb)

    A_eq_b = rng.standard_normal((m_eq, nb))
    A_ub_b = rng.standard_normal((m_ub, nb))
    if scale_spread > 0:
        A_eq_b *= 10.0 ** rng.uniform(-scale_spread, scale_spread, (m_eq, 1))
        A_ub_b *= 10.0 ** rng.uniform(-scale_spread, scale_spread, (m_ub, 1))

    # pin each free var with one equality  f_k - a_k @ x_b = r_k
    pin = rng.standard_normal((n_free, nb))
    f0 = pin @ x0b + rng.standard_normal(n_free)

    A_eq = np.zeros((m_eq + n_free, n))
    A_eq[:m_eq, :nb] = A_eq_b
    A_eq[m_eq:, :nb] = -pin
    A_eq[m_eq:, nb:] = np.eye(n_free)
    b_eq = np.concatenate([A_eq_b @ x0b, f0 - pin @ x0b])

    A_ub = np.zeros((m_ub, n))
    A_ub[:, :nb] = A_ub_b
    b_ub = A_ub_b @ x0b + rng.uniform(0.1, 2.0, m_ub)

    c = rng.standard_normal(n)
    lbv = np.concatenate([lb, np.full(n_free, -np.inf)])
    ubv = np.concatenate([ub, np.full(n_free, np.inf)])
    return GeneralLP(c=c, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq,
                     lb=lbv, ub=ubv, name=f"synth{seed}")
