"""Augmented-system KKT solves (SURVEY.md §7 hard part 1's designed
fallback; reference R5's '2x2 augmented system' alternative).

The normal-equations route squares the condition number: on PRIMAL-DEGENERATE
problems (optimal support < m) cond(A D^2 A^T) ~ 1/mu^2 and the attainable
relative gap floors at ~sqrt(eps) (measured: f32 ~2e-5, f64 ~2e-8).  The
quasi-definite augmented system

    K = [[-(S/X) - reg_p I,  A^T],
         [A,                 reg_d I]]

keeps cond ~ 1/mu, and an f32 LU + iterative refinement reaches the 1e-6
contract on exactly the instances where normal equations stall (validated:
degenerate support=m/2 instance converges in 6 iterations).

Selected with ``SolverOptions(linsys="augmented")``.  Cost: one (n+m) LU per
iteration instead of an m Cholesky — the robustness mode for hard/degenerate
problems, not the throughput path.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ipx.numerics import mv
from ipx.options import SolverOptions


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AugFactor:
    """LU factorization of the regularized augmented matrix."""
    lu: jax.Array       # (n+m, n+m) packed LU
    piv: jax.Array      # (n+m,) pivots
    d2: jax.Array       # (n,) the X/S scaling the factor was built with
    ok: jax.Array       # () bool


def factor(A: jax.Array, d2: jax.Array, opts: SolverOptions,
           reg_scale=1.0) -> AugFactor:
    # A may be STORED bf16 (SolverOptions.a_storage); the augmented factor
    # is the ROBUSTNESS path, so it always works in the solve dtype (the LU
    # and its rhs must agree, and a bf16 K would be numerically useless).
    if A.dtype == jnp.bfloat16:
        A = A.astype(d2.dtype)
    m, n = A.shape
    dt = A.dtype
    reg = jnp.asarray(opts.aug_reg, dt) * jnp.asarray(reg_scale, dt)
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    inv_d2 = 1.0 / jnp.maximum(d2, tiny)          # = s/x
    K = jnp.zeros((n + m, n + m), dt)
    K = K.at[:n, :n].set(-jnp.diag(inv_d2) - reg * jnp.eye(n, dtype=dt))
    K = K.at[:n, n:].set(A.T)
    K = K.at[n:, :n].set(A)
    K = K.at[n:, n:].set(reg * jnp.eye(m, dtype=dt))
    lu, piv = jax.scipy.linalg.lu_factor(K)
    ok = jnp.all(jnp.isfinite(lu)) & jnp.all(
        jnp.abs(jnp.diagonal(lu)) > tiny)
    return AugFactor(lu=lu, piv=piv, d2=d2, ok=ok)


def _apply_unreg(A, d2, dx, dy, prec):
    """The TRUE (unregularized) augmented operator applied to (dx, dy)."""
    tiny = jnp.asarray(jnp.finfo(A.dtype).tiny, A.dtype)
    inv_d2 = 1.0 / jnp.maximum(d2, tiny)
    r1 = -inv_d2 * dx + mv(A.T, dy, prec)
    r2 = mv(A, dx, prec)
    return r1, r2


def _solve_refined(fac: AugFactor, A, r1, r2, opts: SolverOptions):
    """LU solve + refinement sweeps against the unregularized operator."""
    n = A.shape[1]
    prec = opts.matmul_precision
    rhs = jnp.concatenate([r1, r2])
    sol = jax.scipy.linalg.lu_solve((fac.lu, fac.piv), rhs)
    for _ in range(opts.refine_steps):
        a1, a2 = _apply_unreg(A, fac.d2, sol[:n], sol[n:], prec)
        err = jnp.concatenate([r1 - a1, r2 - a2])
        sol = sol + jax.scipy.linalg.lu_solve((fac.lu, fac.piv), err)
    return sol[:n], sol[n:]


def solve_newton(fac: AugFactor, A: jax.Array, x, s, e_p, e_d, e_xs,
                 opts: SolverOptions):
    """Newton direction (dx, dy, ds) for residuals (e_p, e_d, e_xs)."""
    tiny = jnp.asarray(jnp.finfo(x.dtype).tiny, x.dtype)
    xs = jnp.maximum(x, tiny)
    r1 = -e_d + e_xs / xs
    r2 = -e_p
    dx, dy = _solve_refined(fac, A, r1, r2, opts)
    ds = (-e_xs - s * dx) / xs
    return dx, dy, ds


def normal_solve(fac: AugFactor, A: jax.Array, rhs, opts: SolverOptions):
    """Solve (A D^2 A^T) y = rhs through the augmented factor: with r1 = 0,
    row 1 gives dx = D^2 A^T dy, row 2 then A D^2 A^T dy = rhs."""
    n = A.shape[1]
    zeros = jnp.zeros((n,), rhs.dtype)
    _, dy = _solve_refined(fac, A, zeros, rhs, opts)
    return dy


# ---------------------------------------------------------------------------
# Schur-form quasi-definite route (linsys="augmented_schur") — VERDICT r1
# item 6: the dense (n+m) LU above is O((n+m)^3) and unbatchable in
# practice; this mode eliminates the diagonal (1,1) block ANALYTICALLY:
#
#     K = [[-H, A^T], [A, reg_d I]],   H = S/X + reg_p I   (diagonal!)
#     row 1  =>  dx = H^-1 (A^T dy - r1)
#     row 2  =>  (A H^-1 A^T + reg_d I) dy = r2 + A H^-1 r1
#
# The reduced m x m system reuses the batched Cholesky machinery
# (ipx/linsys/normal_eq.py) — fully vmap-safe, so a BATCH of degenerate
# members is rescued in one device program.  The conditioning win of the
# quasi-definite form is retained through the primal regularization:
# H^-1 = x/(s + reg_p x) is CAPPED at 1/reg_p, so the reduced matrix's
# condition never explodes like the raw x/s normal equations, and the
# iterative refinement against the TRUE (unregularized) augmented operator
# removes both reg_p and reg_d from the answer.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AugSchurFactor:
    """Batched-Cholesky factor of the reduced matrix A H^-1 A^T + reg I."""
    ne: object          # NormalEqFactor of the reduced system
    d2p: jax.Array      # (n,) H^-1 = x / (s + reg_p x), the capped scaling
    d2: jax.Array       # (n,) true x/s (refinement operator)
    ok: jax.Array


def _inner_linsys(opts: SolverOptions) -> str:
    """The route the REDUCED m x m system runs on: the batched dense
    Cholesky machinery for "augmented_schur", the distributed Schur layer
    (ipx/linsys/schur.py) for "sharded_schur" — the config-4 ENDGAME
    composition (VERDICT r2 item 2): same capped quasi-definite scaling +
    true-operator refinement, but the reduced matrix is assembled as
    psum_scatter'd row panels and factored by the distributed blocked
    Cholesky, so m never has to fit one chip."""
    return "sharded" if opts.linsys == "sharded_schur" else "dense"


def factor_schur(A: jax.Array, d2: jax.Array, opts: SolverOptions,
                 reg_scale=1.0) -> AugSchurFactor:
    from ipx.linsys import normal_eq
    dt = A.dtype
    reg_p = jnp.asarray(opts.aug_reg, dt) * jnp.asarray(reg_scale, dt)
    # H^-1 = 1 / (1/d2 + reg_p) = d2 / (1 + reg_p d2): capped at 1/reg_p
    d2p = d2 / (1.0 + reg_p * d2)
    # The reduced factor keeps the DENSE route's small relative reg
    # (opts.reg): the capped d2p already bounds the conditioning, and a
    # large inner reg was measured to cripple the inner PCG (stall at
    # ~2e-5 instead of the contract 1e-6)
    ne_opts = opts.replace(linsys=_inner_linsys(opts))
    ne = normal_eq.factor(A, d2p, ne_opts, reg_scale=reg_scale)
    return AugSchurFactor(ne=ne, d2p=d2p, d2=d2, ok=ne.ok)


def _schur_apply(fac: AugSchurFactor, A, r1, r2, opts: SolverOptions):
    """One pass through the reduced system for rhs (r1, r2)."""
    from ipx.linsys import normal_eq
    prec = opts.matmul_precision
    ne_opts = opts.replace(linsys=_inner_linsys(opts))
    dy = normal_eq.solve(fac.ne, A, r2 + mv(A, fac.d2p * r1, prec), ne_opts)
    dx = fac.d2p * (mv(A.T, dy, prec) - r1)
    return dx, dy


def _schur_solve_refined(fac: AugSchurFactor, A, r1, r2,
                         opts: SolverOptions):
    """Reduced-system solve + refinement against the TRUE augmented
    operator (no reg_p / reg_d) — same refinement contract as the LU
    route's _solve_refined.  ``aug_schur_refine`` outer sweeps (5 measured
    necessary for 4/4 on the degenerate battery)."""
    prec = opts.matmul_precision
    dx, dy = _schur_apply(fac, A, r1, r2, opts)
    for _ in range(opts.aug_schur_refine):
        a1, a2 = _apply_unreg(A, fac.d2, dx, dy, prec)
        ddx, ddy = _schur_apply(fac, A, r1 - a1, r2 - a2, opts)
        dx, dy = dx + ddx, dy + ddy
    return dx, dy


def solve_newton_schur(fac: AugSchurFactor, A: jax.Array, x, s, e_p, e_d,
                       e_xs, opts: SolverOptions):
    """Newton direction via the reduced quasi-definite system (vmap-safe)."""
    tiny = jnp.asarray(jnp.finfo(x.dtype).tiny, x.dtype)
    xs = jnp.maximum(x, tiny)
    r1 = -e_d + e_xs / xs
    r2 = -e_p
    dx, dy = _schur_solve_refined(fac, A, r1, r2, opts)
    ds = (-e_xs - s * dx) / xs
    return dx, dy, ds


def normal_solve_schur(fac: AugSchurFactor, A: jax.Array, rhs,
                       opts: SolverOptions):
    n = A.shape[1]
    zeros = jnp.zeros((n,), rhs.dtype)
    _, dy = _schur_solve_refined(fac, A, zeros, rhs, opts)
    return dy
