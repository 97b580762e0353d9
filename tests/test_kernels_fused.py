"""Unit tests for the fused A-resident matvec kernel (ipx/kernels/fused.py).

Oracle: numpy float64.  On CPU the kernel runs in Pallas interpret mode —
identical code to the TPU path (SURVEY.md §4.2 fake-backend principle).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ipx.kernels import fused


@pytest.mark.parametrize("m,n", [(128, 256), (256, 512), (64, 384)])
def test_ata_apply_full(m, n):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((m, n)).astype(np.float32)
    vm = rng.standard_normal(m).astype(np.float32)
    alpha = np.abs(rng.standard_normal(n)).astype(np.float32)
    wn = rng.standard_normal(n).astype(np.float32)
    y, t = fused.ata_apply(jnp.asarray(A), jnp.asarray(vm),
                           jnp.asarray(alpha), jnp.asarray(wn))
    t_ref = A.astype(np.float64).T @ vm
    y_ref = A.astype(np.float64) @ (alpha * t_ref + wn)
    np.testing.assert_allclose(np.asarray(t), t_ref, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5,
                               atol=1e-3 * (1 + np.abs(y_ref).max()))


def test_ata_apply_pair_mode():
    # alpha=None: y = A @ wn and t = A^T vm are an INDEPENDENT pair
    rng = np.random.default_rng(1)
    m, n = 128, 256
    A = rng.standard_normal((m, n)).astype(np.float32)
    vm = rng.standard_normal(m).astype(np.float32)
    wn = rng.standard_normal(n).astype(np.float32)
    y, t = fused.ata_apply(jnp.asarray(A), jnp.asarray(vm), None,
                           jnp.asarray(wn))
    np.testing.assert_allclose(np.asarray(y), A @ wn, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), A.T @ vm, rtol=2e-5, atol=1e-4)


def test_ata_apply_operator_mode():
    # wn=None, alpha=d2: the matrix-free normal operator A (d2 (A^T v))
    rng = np.random.default_rng(2)
    m, n = 128, 384
    A = rng.standard_normal((m, n)).astype(np.float32)
    v = rng.standard_normal(m).astype(np.float32)
    d2 = np.abs(rng.standard_normal(n)).astype(np.float32) + 0.1
    y, _ = fused.ata_apply(jnp.asarray(A), jnp.asarray(v),
                           jnp.asarray(d2), None)
    ref = A.astype(np.float64) @ (d2 * (A.T.astype(np.float64) @ v))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5,
                               atol=1e-3 * (1 + np.abs(ref).max()))


def test_ata_apply_vmap():
    rng = np.random.default_rng(3)
    B, m, n = 3, 128, 256
    A = rng.standard_normal((B, m, n)).astype(np.float32)
    vm = rng.standard_normal((B, m)).astype(np.float32)
    d2 = np.abs(rng.standard_normal((B, n))).astype(np.float32)
    wn = rng.standard_normal((B, n)).astype(np.float32)
    y, t = jax.vmap(fused.ata_apply)(jnp.asarray(A), jnp.asarray(vm),
                                     jnp.asarray(d2), jnp.asarray(wn))
    for b in range(B):
        t_ref = A[b].T @ vm[b]
        y_ref = A[b] @ (d2[b] * t_ref + wn[b])
        np.testing.assert_allclose(np.asarray(t)[b], t_ref, rtol=2e-5,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(y)[b], y_ref, rtol=2e-4,
                                   atol=1e-3 * (1 + np.abs(y_ref).max()))


def test_stripe_width():
    assert fused.stripe_width(1024, 2048) is not None
    assert fused.stripe_width(1024, 2048) % 128 == 0
    assert 2048 % fused.stripe_width(1024, 2048) == 0
    assert fused.stripe_width(64, 100) is None      # no 128-divisor
    # big m shrinks the stripe toward the 128 floor to bound VMEM
    w_big = fused.stripe_width(8192, 16384)
    assert w_big == 128      # 4MB block: the floor for very tall A


def test_fused_matvec_backend_end_to_end():
    """Full solve with matvec_backend='fused' (interpret mode on CPU)
    matches the XLA route and the constructed optimum."""
    import ipx
    from ipx.problem.generate import random_feasible_lp
    g = random_feasible_lp(64, 128, seed=4)       # n=128: stripe exists
    base = ipx.SolverOptions(dtype="float32")
    sol_x = ipx.solve(g.c, g.A, g.b, options=base, presolve=False)
    sol_f = ipx.solve(g.c, g.A, g.b, presolve=False,
                      options=base.replace(matvec_backend="fused"))
    assert sol_f.optimal, sol_f.status_name
    rel = abs(sol_f.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 2e-6, f"rel err {rel:.2e}"
    # same iteration count +-1: the fused route reorders only rounding
    assert abs(sol_f.iterations - sol_x.iterations) <= 1


def test_fused_matvec_backend_batched():
    import jax.numpy as jnp
    import ipx
    from ipx.ipm import batched
    from ipx.problem.generate import random_feasible_lp
    from ipx.problem.lp import make_lp
    gs = [random_feasible_lp(64, 128, seed=10 + i) for i in range(3)]
    opts = ipx.SolverOptions(dtype="float32", matvec_backend="fused")
    sols = ipx.solve_batch([make_lp(g.c, g.A, g.b) for g in gs], options=opts)
    for g, s in zip(gs, sols):
        assert s.optimal, s.status_name
        assert abs(s.objective - g.obj_star) / (1 + abs(g.obj_star)) <= 2e-6
