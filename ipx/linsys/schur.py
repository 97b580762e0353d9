"""Sharded Schur-complement normal equations (SURVEY.md component N11).

BASELINE config 4: a single large LP (m=32k, n=64k) whose normal matrix
M = A D^2 A^T (m x m, gigabytes) cannot live replicated on one chip.
TPU-native design (SURVEY.md §5.7, §7 hard part 4):

  * A is sharded over its COLUMNS (variables) on mesh axis "row" — the
    reduction dimension of  M = sum_j d2_j A[:,j] A[:,j]^T.
  * Each device forms its local partial  (A_s * d2_s) @ A_s^T  (one MXU
    einsum) and a ``psum_scatter`` over ICI leaves each device with a ROW
    PANEL of the Jacobi-scaled M — M is never materialized in one place
    (the same ring-reduction pattern ring-attention uses for KV blocks).
  * A DISTRIBUTED BLOCKED CHOLESKY factors the panel-distributed matrix in
    p sequential block steps: step k broadcasts the block column
    (all_gather, m x m/p) and every device applies the trailing syrk to its
    own panel — right-looking, MXU matmuls throughout.
  * Triangular solves are blocked substitutions across devices (p steps,
    one masked psum broadcast of an m/p-vector per step).
  * The IPM direction solve is preconditioned CG on the true operator
    (matrix-free matvecs through the sharded A; XLA GSPMD inserts the
    psum), with the exact distributed factor as preconditioner — same
    structure as the dense path in ipx/linsys/normal_eq.py.

The IPM layer selects this backend with ``SolverOptions(linsys="sharded")``;
the active mesh is supplied by :func:`use_mesh` (a trace-time contextvar, so
the jitted program is specialized to the mesh).
"""
from __future__ import annotations

import contextlib
import contextvars
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ipx.mesh import ROW_AXIS
from ipx.numerics import mm, mv
from ipx.options import SolverOptions

_ACTIVE_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "ipx_schur_mesh", default=None)


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    """Set the mesh used by sharded factor/solve during tracing."""
    tok = _ACTIVE_MESH.set(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH.reset(tok)


def active_mesh() -> Mesh:
    mesh = _ACTIVE_MESH.get()
    if mesh is None:
        raise RuntimeError(
            "linsys='sharded' requires an active mesh: wrap the jit/trace in "
            "ipx.linsys.schur.use_mesh(mesh) (ipx.api.solve_large does).")
    return mesh


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SchurFactor:
    """Distributed Cholesky factor of  J (A D^2 A^T) J + reg I.

    ``Lpanel`` is the global (m, m) lower factor laid out as row panels
    (each device owns m/p contiguous rows).  ``j`` is the global Jacobi
    scale; ``d2`` the (column-sharded) scaling vector.
    """
    Lpanel: jax.Array   # (m, m) distributed row panels of L
    j: jax.Array        # (m,) Jacobi scale, replicated
    d2: jax.Array       # (n,) column-sharded
    ok: jax.Array       # () bool


def _dist_cholesky(panel, p: int, mp: int):
    """Right-looking blocked Cholesky of a row-panel-distributed matrix.

    ``panel``: this device's (mp, m) rows of the SPD matrix.  p static block
    steps; step k all_gathers the freshly computed block column (m, mp) so
    every device can apply the trailing update to its rows.  Runs inside
    shard_map; all slices static (k is a Python int).
    """
    i = lax.axis_index(ROW_AXIS)
    m = panel.shape[1]
    Lp = jnp.zeros_like(panel)
    eye = jnp.eye(mp, dtype=panel.dtype)
    for k in range(p):
        o = k * mp
        blk = panel[:, o:o + mp]                    # my M[i,k] block (mp,mp)
        # broadcast M_kk (device k's diagonal block)
        Mkk = lax.psum(jnp.where(i == k, blk, 0.0), ROW_AXIS)
        Lkk = jnp.linalg.cholesky(Mkk)
        # every device computes inv(L_kk) redundantly (mp^3, tiny) so the
        # panel TRSM below is a plain MXU matmul
        Wkk = jax.scipy.linalg.solve_triangular(Lkk, eye, lower=True)
        Lik = jnp.where(
            i > k, mm(blk, Wkk.T, "highest"),
            jnp.where(i == k, Lkk, jnp.zeros_like(blk)))
        col = lax.all_gather(Lik, ROW_AXIS, tiled=True)   # (m, mp)
        if o + mp < m:
            # trailing syrk on my rows: M[i, k+1:] -= L[i,k] @ col[k+1:,:]^T
            panel = panel.at[:, o + mp:].add(
                -mm(Lik, col[o + mp:, :].T, "highest"))
        Lp = Lp.at[:, o:o + mp].set(Lik)
    return Lp


def _dist_solve_lower(Lp, r, p: int, mp: int):
    """Solve L y = r (blocked forward substitution across devices).

    ``Lp``: my (mp, m) rows of L; ``r``: replicated (m,).  Returns
    replicated y.  p steps; step k broadcasts device k's mp-subvector."""
    i = lax.axis_index(ROW_AXIS)
    y = jnp.zeros_like(r)
    for k in range(p):
        o = k * mp
        pref = mv(Lp[:, :o], y[:o], "highest") if o else 0.0
        rk = r[o:o + mp] - pref                     # correct on device k
        Lkk = Lp[:, o:o + mp]
        yk = jax.scipy.linalg.solve_triangular(Lkk, rk, lower=True)
        yk = lax.psum(jnp.where(i == k, yk, 0.0), ROW_AXIS)
        y = y.at[o:o + mp].set(yk)
    return y


def _dist_solve_upper(Lp, r, p: int, mp: int):
    """Solve L^T x = r (blocked backward substitution across devices).

    U = L^T has block row k = column block k of L spread across devices
    j >= k; each device contributes L[j,k]^T x_j locally, psum-reduced."""
    i = lax.axis_index(ROW_AXIS)
    m = r.shape[0]
    x = jnp.zeros_like(r)
    for k in range(p - 1, -1, -1):
        o = k * mp
        # s = sum_{j>k} L[j,k]^T x_j : my contribution uses my rows' block
        # in column k and my slice of x; devices <= k contribute zero.
        contrib = mv(Lp[:, o:o + mp].T, x_slice(x, i, mp), "highest")
        s = lax.psum(jnp.where(i > k, contrib, 0.0), ROW_AXIS)
        Lkk = Lp[:, o:o + mp]
        xk = jax.scipy.linalg.solve_triangular(Lkk.T, r[o:o + mp] - s,
                                               lower=False)
        xk = lax.psum(jnp.where(i == k, xk, 0.0), ROW_AXIS)
        x = x.at[o:o + mp].set(xk)
    return x


def x_slice(x, i, mp: int):
    """Device i's mp-slice of a replicated vector (dynamic, index-typed)."""
    return lax.dynamic_slice(x, (i * mp,), (mp,))


def factor(A: jax.Array, d2: jax.Array, opts: SolverOptions,
           reg_scale=1.0) -> SchurFactor:
    """Sharded assembly + distributed Cholesky of the scaled normal matrix."""
    mesh = active_mesh()
    p = mesh.shape[ROW_AXIS]
    m = A.shape[0]
    if m % p:
        raise ValueError(f"m={m} must be divisible by row-shards p={p}")
    mp = m // p

    # Global Jacobi scale from diag(M) = (A*A) @ d2 — one sharded matvec,
    # no assembly needed.
    diag = mv(A * A, d2, opts.matmul_precision)
    tiny = jnp.asarray(jnp.finfo(A.dtype).tiny, A.dtype)
    j = lax.rsqrt(jnp.maximum(diag, tiny))
    reg = (jnp.asarray(opts.reg, A.dtype)
           * jnp.asarray(reg_scale, A.dtype))

    def local(A_loc, d2_loc, j_rep):
        # A_loc: (m, n/p) this device's columns; j_rep: (m,) replicated.
        i = lax.axis_index(ROW_AXIS)
        scaled = (A_loc * d2_loc[None, :]) * j_rep[:, None]
        partial = mm(scaled, (A_loc * j_rep[:, None]).T,
                     opts.matmul_precision)          # (m, m) local partial
        panel = lax.psum_scatter(partial, ROW_AXIS, scatter_dimension=0,
                                 tiled=True)          # (m/p, m)
        # add reg I to my diagonal block
        rows = jax.lax.broadcasted_iota(jnp.int32, (mp, m), 0) + i * mp
        cols = jax.lax.broadcasted_iota(jnp.int32, (mp, m), 1)
        panel = panel + reg * (rows == cols).astype(panel.dtype)
        return _dist_cholesky(panel, p, mp)

    Lpanel = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, ROW_AXIS), P(ROW_AXIS), P()),
        out_specs=P(ROW_AXIS, None),
        check_vma=False,
    )(A, d2, j)

    ldiag = jnp.diagonal(Lpanel)
    ok = (jnp.all(jnp.isfinite(ldiag)) & jnp.all(ldiag > 0)
          & jnp.all(jnp.isfinite(j)))
    return SchurFactor(Lpanel=Lpanel, j=j, d2=d2, ok=ok)


def _precond(fac: SchurFactor, r: jax.Array, mesh: Mesh) -> jax.Array:
    """Exact-factor apply: z = J (L L^T)^-1 J r via distributed solves."""
    m = r.shape[0]
    p = mesh.shape[ROW_AXIS]
    mp = m // p

    def local(Lp, r_rep):
        y = _dist_solve_lower(Lp, r_rep, p, mp)
        return _dist_solve_upper(Lp, y, p, mp)

    z = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ROW_AXIS, None), P()),
        out_specs=P(),
        check_vma=False,
    )(fac.Lpanel, fac.j * r)
    return fac.j * z


def solve(fac: SchurFactor, A: jax.Array, rhs: jax.Array,
          opts: SolverOptions) -> jax.Array:
    """Preconditioned CG on the true sharded operator A D^2 A^T.

    Matvecs go matrix-free through the column-sharded A (GSPMD inserts the
    ICI psum); the preconditioner is the exact distributed Cholesky of the
    regularized scaled matrix — same PCG structure as the dense path, so
    ``opts.refine_steps`` (not cg_iters_sharded) sets the iteration count.
    """
    mesh = active_mesh()
    prec = opts.matmul_precision
    dt = rhs.dtype
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)

    def op(v):
        return mv(A, fac.d2 * mv(A.T, v, prec), prec)

    y = _precond(fac, rhs, mesh)
    if opts.refine_steps <= 0:
        return y
    r = rhs - op(y)
    z = _precond(fac, r, mesh)
    p_ = z
    rz = jnp.vdot(r, z)
    for i in range(opts.refine_steps):
        Ap = op(p_)
        pAp = jnp.vdot(p_, Ap)
        ok = pAp > tiny
        alpha = jnp.where(ok, rz / jnp.where(ok, pAp, jnp.ones((), dt)),
                          jnp.zeros((), dt))
        y = y + alpha * p_
        if i == opts.refine_steps - 1:
            # last-iteration tail (r, precond, beta, p) feeds nothing —
            # skipping it is bit-identical in y (see normal_eq.solve)
            break
        r = r - alpha * Ap
        z = _precond(fac, r, mesh)
        rz_new = jnp.vdot(r, z)
        ok_b = jnp.abs(rz) > tiny
        beta = jnp.where(ok_b, rz_new / jnp.where(ok_b, rz, jnp.ones((), dt)),
                         jnp.zeros((), dt))
        p_ = z + beta * p_
        rz = rz_new
    return y
