"""Sharded Schur-complement tests on the 8-device CPU mesh (SURVEY.md §4.2
"Distributed w/o cluster": the same shard_map + psum_scatter code that rides
ICI on TPU runs on the host-platform fake mesh in CI)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ipx
from ipx import mesh as meshlib
from ipx.linsys import schur, normal_eq
from ipx.problem.generate import random_feasible_lp


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 (virtual) devices")


@needs_8
def test_sharded_factor_solve_matches_dense():
    """One sharded normal-equations solve == the dense-path solve."""
    rng = np.random.default_rng(0)
    m, n = 64, 128
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n), jnp.float32)
    d2 = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(m), jnp.float32)

    dense_opts = ipx.SolverOptions(dtype="float32")
    fac_d = normal_eq.factor(A, d2, dense_opts)
    y_dense = normal_eq.solve(fac_d, A, rhs, dense_opts)

    mesh = meshlib.make_mesh(batch=1, row=8)
    sh_opts = dense_opts.replace(linsys="sharded", cg_iters_sharded=60)
    with schur.use_mesh(mesh):
        fac_s = normal_eq.factor(A, d2, sh_opts)
        y_sh = normal_eq.solve(fac_s, A, rhs, sh_opts)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_dense),
                               rtol=2e-3, atol=2e-4)


@needs_8
def test_solve_large_matches_unsharded():
    """Full IPM on the sharded backend == dense backend objective."""
    g = random_feasible_lp(64, 128, seed=1)
    dense = ipx.solve(g.c, g.A, g.b,
                      options=ipx.SolverOptions(dtype="float32"))
    mesh = meshlib.make_mesh(batch=1, row=8)
    sol = ipx.solve_large(g.c, g.A, g.b, mesh=mesh,
                          options=ipx.SolverOptions(dtype="float32",
                                                    cg_iters_sharded=60))
    assert sol.optimal, sol.iteration_table()
    rel = abs(sol.objective - dense.objective) / (1 + abs(dense.objective))
    assert rel <= 5e-6
    rel_star = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel_star <= 5e-6


@needs_8
def test_solve_large_rejects_indivisible():
    g = random_feasible_lp(30, 50, seed=2)
    mesh = meshlib.make_mesh(batch=1, row=8)
    with pytest.raises(ValueError):
        ipx.solve_large(g.c, g.A, g.b, mesh=mesh)


@needs_8
def test_sharded_midsize_matches_dense():
    """VERDICT r1 item 4: mid-size (512 x 1024, p=8) sharded-vs-dense
    equality — the distributed blocked Cholesky + substitutions at a panel
    size (64 x 512) where blocking/indexing bugs can't hide in toy shapes."""
    rng = np.random.default_rng(3)
    m, n = 512, 1024
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n), jnp.float32)
    d2 = jnp.asarray(rng.uniform(0.1, 10.0, n), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(m), jnp.float32)

    dense_opts = ipx.SolverOptions(dtype="float32")
    fac_d = normal_eq.factor(A, d2, dense_opts)
    y_dense = normal_eq.solve(fac_d, A, rhs, dense_opts)

    mesh = meshlib.make_mesh(batch=1, row=8)
    sh_opts = dense_opts.replace(linsys="sharded")
    with schur.use_mesh(mesh):
        fac_s = normal_eq.factor(A, d2, sh_opts)
        y_sh = normal_eq.solve(fac_s, A, rhs, sh_opts)
    # both routes solve the same (well-regularized) system with CG on the
    # true operator: answers agree to f32 solve accuracy
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_dense),
                               rtol=5e-3, atol=5e-4)


@needs_8
def test_sharded_schur_endgame_degenerate():
    """Config-4 f32 endgame (VERDICT r2 item 2): the sharded augmented-
    Schur route must reach the 1e-6 contract on a primal-DEGENERATE
    instance (support < m), where plain sharded normal equations hit the
    sqrt(eps) conditioning floor.  (solve_large's automatic fallback into
    this route is exercised on the real chip by benchmarks/large_lp.py —
    compiling both full programs here would double an already-heavy CPU
    compile, ~3 min for this test alone.)"""
    g = random_feasible_lp(64, 128, seed=7, support=48)
    mesh = meshlib.make_mesh(batch=1, row=8)
    sol = ipx.solve_large(g.c, g.A, g.b, mesh=mesh,
                          options=ipx.SolverOptions(dtype="float32",
                                                    linsys="sharded_schur"))
    assert sol.optimal, sol.iteration_table()
    assert sol.rel_gap <= 1e-6
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 2e-5


@needs_8
def test_sharded_blocked_diag_path_matches_dense():
    """mp = m/p >= 128: the distributed factor/solves take the 128-BLOCKED
    diagonal path (blocked potrf + stored block inverses + matmul
    substitutions — the compile-light route that replaced the per-iteration
    solve_triangular-against-eye).  Equality vs the dense route."""
    rng = np.random.default_rng(5)
    m, n = 1024, 2048
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n), jnp.float32)
    d2 = jnp.asarray(rng.uniform(0.1, 10.0, n), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(m), jnp.float32)

    dense_opts = ipx.SolverOptions(dtype="float32")
    fac_d = normal_eq.factor(A, d2, dense_opts)
    y_dense = normal_eq.solve(fac_d, A, rhs, dense_opts)

    mesh = meshlib.make_mesh(batch=1, row=8)   # mp = 128: blocked path
    sh_opts = dense_opts.replace(linsys="sharded")

    # jit the whole factor+solve: EAGER shard_map lowers every primitive of
    # the unrolled blocked chain as its own micro-compile (minutes), which
    # no production path does (api.solve_large jits the full solve)
    @jax.jit
    def fs(A, d2, rhs):
        fac_s = normal_eq.factor(A, d2, sh_opts)
        return normal_eq.solve(fac_s, A, rhs, sh_opts), fac_s.Wd

    with schur.use_mesh(mesh):
        y_sh, Wd = fs(A, d2, rhs)
    assert Wd.shape == (m // 128, 128, 128)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_dense),
                               rtol=5e-3, atol=5e-4)


def test_sharded_bf16_storage():
    """bf16-stored A on the sharded route (config 4 at m=32k needs it:
    f32 A alone is 8.6GB): blockwise split3 assembly + f32-upcast diag
    (schur._assemble_partial_scan / _diag_scan), instance rounded to bf16
    so the constructed optimum stays exact."""
    import numpy as np
    import jax.numpy as jnp
    import ipx
    from ipx import mesh as meshlib

    rng = np.random.default_rng(7)
    m, n = 256, 512
    A = np.asarray(jnp.asarray(
        rng.normal(size=(m, n)).astype(np.float32) / np.sqrt(n),
        jnp.bfloat16).astype(jnp.float32))
    perm = rng.permutation(n)
    x_star = np.zeros(n, np.float32)
    x_star[perm[:m]] = rng.uniform(0.5, 2.0, m).astype(np.float32)
    s_star = np.zeros(n, np.float32)
    s_star[perm[m:]] = rng.uniform(0.5, 2.0, n - m).astype(np.float32)
    y_star = rng.normal(size=m).astype(np.float32)
    c = A.T @ y_star + s_star
    b = A @ x_star
    obj_star = float(c @ x_star)
    mesh = meshlib.make_mesh(batch=1, row=min(8, len(jax.devices())))
    sol = ipx.solve_large(c, A, b, mesh=mesh, options=ipx.SolverOptions(
        dtype="float32", a_storage="bfloat16"))
    rel = abs(sol.objective - obj_star) / (1 + abs(obj_star))
    assert sol.optimal, sol.status_name
    assert rel <= 2e-6, f"rel err {rel:.2e}"


def test_solve_large_exec_chunked_matches_unchunked():
    """exec_chunk_iters (capped device executions + in-process resume)
    continues the run across executions: same status and the same optimum
    to f32-trajectory tolerance (r5; the m>=24k device-fault workaround).
    NOT bit-identical: the boundary refresh recomputes the carried
    residuals in a different XLA program, whose few-ulp reduction-order
    differences the endgame amplifies chaotically — both runs converge."""
    import ipx
    from ipx.problem.generate import random_feasible_lp

    g = random_feasible_lp(256, 512, seed=4)
    o = ipx.SolverOptions(augmented_fallback=False)
    full = ipx.solve_large(g.c, g.A, g.b, options=o)
    chunked = ipx.solve_large(g.c, g.A, g.b, options=o, exec_chunk_iters=5)
    assert chunked.status == full.status
    assert abs(chunked.objective - full.objective) <= (
        1e-5 * (1 + abs(full.objective))), (chunked.objective, full.objective)
    rel = abs(chunked.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 2e-6, rel


def test_p1_lt_layout_path_matches_dense(monkeypatch):
    """The p=1 contract-scale memory path (in-place scan factor stored
    TRANSPOSED + LT-consuming solves) must give the same solution as the
    general sharded path.  The size gate (mp>=4096) is lowered so the path
    runs on CPU at test scale."""
    import ipx
    from ipx.linsys import schur
    from ipx.problem.generate import random_feasible_lp

    monkeypatch.setattr(
        schur, "_p1_lt_layout",
        lambda p, mp: p == 1 and schur._dblk(mp) == schur._NB and mp >= 256)
    g = random_feasible_lp(512, 1024, seed=6)
    o = ipx.SolverOptions(augmented_fallback=False)
    from ipx import mesh as meshlib
    mesh = meshlib.make_mesh(batch=1, row=1)
    sol = ipx.solve_large(g.c, g.A, g.b, mesh=mesh, options=o)
    assert sol.optimal, sol.status_name
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 2e-6, rel
