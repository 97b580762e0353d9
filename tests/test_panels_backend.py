"""chol_backend="panels" (XLA left-looking factor emitting suffix-only
panels + Mosaic panel pair-solves) and the O(1)-program-size scan factor
``normal_eq._potrf_left_scan`` (the config-4 m>=8192 compile-wall fix).
Oracle: numpy float64 Cholesky / direct solve, plus bit-level agreement
with the already-validated blocked_left factor (same algebra)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ipx
from ipx.linsys import normal_eq
from ipx.kernels import cholesky as pk


def _rand_spd(m, seed, cond=1e3):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    lam = np.logspace(0, -np.log10(cond), m)
    return (Q * lam) @ Q.T


@pytest.mark.parametrize("m", [128, 256, 384])
def test_potrf_left_panels_matches_numpy(m):
    M = _rand_spd(m, seed=m).astype(np.float32)
    panels, W = normal_eq._blocked_potrf_left_panels(jnp.asarray(M), pk.NB)
    L_ref = np.linalg.cholesky(M.astype(np.float64))
    assert len(panels) == m // pk.NB
    for k, p in enumerate(panels):
        o = k * pk.NB
        assert p.shape == (pk.NB, m - o)
        # panel k holds rows o..o+NB of L^T from the diagonal on
        ref = L_ref.T[o:o + pk.NB, o:]
        np.testing.assert_allclose(np.asarray(p), ref, rtol=2e-3,
                                   atol=5e-5 * np.abs(L_ref).max())
        blk = np.asarray(p)[:, :pk.NB].T
        np.testing.assert_allclose(np.asarray(W)[k] @ blk, np.eye(pk.NB),
                                   atol=5e-4)


def test_potrf_left_panels_matches_blocked_left():
    """Same algebra as _blocked_potrf_left up to f32 reduction order (the
    panel form splits the one deferred-update matmul into k per-panel
    matmuls, so the accumulation order differs from panel 2 on)."""
    m = 512
    M = jnp.asarray(_rand_spd(m, seed=3).astype(np.float32))
    LT, W = normal_eq._blocked_potrf_left(M, 128)
    panels, Wp = normal_eq._blocked_potrf_left_panels(M, 128)
    np.testing.assert_allclose(np.asarray(W), np.asarray(Wp),
                               atol=5e-4, rtol=1e-3)
    scale = float(jnp.max(jnp.abs(LT)))
    for k, p in enumerate(panels):
        o = k * pk.NB
        np.testing.assert_allclose(np.asarray(p),
                                   np.asarray(LT)[o:o + pk.NB, o:],
                                   atol=5e-5 * scale, rtol=1e-4)


@pytest.mark.parametrize("m", [256, 512])
def test_potrf_left_scan_matches_static(m):
    """The fori_loop factor computes the same Schur complements as the
    static form; f32 op-order differs only in dead masked lanes."""
    M = jnp.asarray(_rand_spd(m, seed=m + 1).astype(np.float32))
    LT1, W1 = normal_eq._blocked_potrf_left(M, 128)
    LT2, W2 = normal_eq._potrf_left_scan(M, 128)
    scale = float(jnp.max(jnp.abs(LT1)))
    np.testing.assert_allclose(np.asarray(LT2), np.asarray(LT1),
                               atol=5e-5 * scale, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(W2), np.asarray(W1),
                               atol=5e-4, rtol=1e-3)


def test_potrf_left_scan_vmap():
    B, m = 2, 256
    Ms = jnp.asarray(np.stack([_rand_spd(m, seed=40 + b).astype(np.float32)
                               for b in range(B)]))
    LT, W = jax.vmap(lambda M: normal_eq._potrf_left_scan(M, 128))(Ms)
    assert LT.shape == (B, m, m) and W.shape == (B, m // 128, 128, 128)
    for b in range(B):
        ref = np.linalg.cholesky(np.asarray(Ms)[b].astype(np.float64)).T
        np.testing.assert_allclose(np.asarray(LT)[b], ref, rtol=2e-3,
                                   atol=5e-5 * np.abs(ref).max())


def test_panels_factor_solve_roundtrip():
    """normal_eq.factor + solve with the panels backend solves
    (A D^2 A^T) y = rhs (includes the 128-padding path: m=200)."""
    rng = np.random.default_rng(11)
    m, n = 200, 400
    A = rng.standard_normal((m, n)).astype(np.float32) / np.sqrt(n)
    d2 = np.abs(rng.standard_normal(n)).astype(np.float32) + 0.1
    rhs = rng.standard_normal(m).astype(np.float32)
    opts = ipx.SolverOptions(dtype="float32", chol_backend="panels",
                             refine_steps=2)
    fac = normal_eq.factor(jnp.asarray(A), jnp.asarray(d2), opts)
    assert bool(fac.ok)
    assert len(fac.LTp) == 2 and fac.LTp[0].shape == (128, 256)
    y = normal_eq.solve(fac, jnp.asarray(A), jnp.asarray(rhs), opts)
    M = (A.astype(np.float64) * d2) @ A.astype(np.float64).T
    y_ref = np.linalg.solve(M, rhs.astype(np.float64))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4,
                               atol=1e-4 * (1 + np.abs(y_ref).max()))


def test_panels_backend_end_to_end():
    from ipx.problem.generate import random_feasible_lp
    g = random_feasible_lp(96, 192, seed=5)
    sol = ipx.solve(g.c, g.A, g.b, presolve=False,
                    options=ipx.SolverOptions(dtype="float32",
                                              chol_backend="panels"))
    assert sol.optimal, sol.status_name
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 2e-6, f"rel err {rel:.2e}"


def test_panels_backend_batched():
    from ipx.problem.generate import random_feasible_lp
    from ipx.problem.lp import make_lp
    gs = [random_feasible_lp(96, 192, seed=20 + i) for i in range(3)]
    opts = ipx.SolverOptions(dtype="float32", chol_backend="panels",
                             matvec_backend="fused")
    sols = ipx.solve_batch([make_lp(g.c, g.A, g.b) for g in gs],
                           options=opts)
    for g, s in zip(gs, sols):
        assert s.optimal, s.status_name
        assert abs(s.objective - g.obj_star) / (1 + abs(g.obj_star)) <= 2e-6


def test_pair_solves_odd_batch_padding():
    """Odd (non-power-of-two) batch sizes through BOTH Mosaic pair-solve
    entries.  On real Mosaic a (3, m) VMEM scratch is rounded up to the
    4-sublane tile, making every full-ref read a misaligned slice — the
    r4 probe crash ("Slice shape along dimension 0 must be aligned to
    tiling (4), but is 3") from a 3-instance rescue sub-batch.  The
    entries now pad the batch to a power-of-two/multiple-of-8 and slice
    back; this pins the padding algebra (the Mosaic alignment itself is
    only observable on hardware)."""
    import numpy as np
    from ipx.kernels import cholesky as pk
    from ipx.linsys import normal_eq

    rng = np.random.default_rng(7)
    m = 256
    for B in (1, 3, 5, 6, 12):
        A = jnp.asarray(rng.standard_normal((B, m, m)).astype(np.float32)) / 16
        # all-f32 construction: the suite runs with jax_enable_x64, where a
        # default-dtype eye would silently promote the whole chain to f64
        # and the f32 kernel's ref stores would reject the mixed dtypes
        M = (jnp.matmul(A, jnp.swapaxes(A, 1, 2))
             + 2 * jnp.eye(m, dtype=jnp.float32)[None])
        b = jnp.asarray(rng.standard_normal((B, m)).astype(np.float32))
        ref = jnp.linalg.solve(M, b[..., None])[..., 0]
        L = jnp.linalg.cholesky(M)
        LT = jnp.swapaxes(L, 1, 2)
        blocks = jnp.stack([L[:, j * 128:(j + 1) * 128,
                              j * 128:(j + 1) * 128]
                            for j in range(m // 128)], axis=1)
        W = jax.vmap(normal_eq._invert_lower_blocks)(blocks)
        x1 = pk.chol_solve_batched_lt(LT, W, b)
        panels, Wp = jax.vmap(
            lambda Mi: normal_eq._blocked_potrf_left_panels(Mi, 128))(M)
        x2 = pk.chol_solve_batched_panels(panels, Wp, b)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(x1 - ref))) / scale < 1e-4, B
        assert float(jnp.max(jnp.abs(x2 - ref))) / scale < 1e-4, B


@pytest.mark.parametrize("m", [256, 512])
def test_potrf_left_scan_inplace_matches_scan(m):
    """The in-place (single-buffer) scan factor is algebraically identical
    to the two-buffer scan: the only delta is the explicit rows<o mask on
    the accumulation column block (structurally-zero rows in the two-buffer
    form).  This is the m=32k config-4 memory-wall path (r5)."""
    M = jnp.asarray(_rand_spd(m, seed=m + 7).astype(np.float32))
    LT1, W1 = normal_eq._potrf_left_scan(M, 128)
    LT2, W2 = normal_eq._potrf_left_scan_inplace(M, 128)
    scale = float(jnp.max(jnp.abs(LT1)))
    np.testing.assert_allclose(np.asarray(LT2), np.asarray(LT1),
                               atol=5e-5 * scale, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(W2), np.asarray(W1),
                               atol=5e-4, rtol=1e-3)
    # and against the f64 oracle
    ref = np.linalg.cholesky(np.asarray(M).astype(np.float64)).T
    np.testing.assert_allclose(np.asarray(LT2), ref, rtol=2e-3,
                               atol=5e-5 * np.abs(ref).max())


def test_potrf_left_scan_inplace_reconstructs():
    """L @ L^T of the in-place factor reconstructs M (the layout the p=1
    contract-scale gate in schur._dist_cholesky returns as Lpanel)."""
    m = 512
    M = jnp.asarray(_rand_spd(m, seed=99).astype(np.float32))
    LT, W = normal_eq._potrf_left_scan_inplace(M, 128)
    L = np.asarray(LT).T
    rec = L @ L.T
    np.testing.assert_allclose(rec, np.asarray(M), rtol=5e-3,
                               atol=1e-4 * float(np.abs(np.asarray(M)).max()))
