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


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_a_matvec_at_matvec(dtype):
    """Forward/transpose-only stripe kernels vs numpy, f32 and bf16-stored A.

    For bf16 storage the kernel contracts via the 3-way bf16 split
    (_split3_dot): the result must match the f64 product of the STORED
    values to f32 accuracy (the split reconstructs the f32 vector exactly).
    """
    rng = np.random.default_rng(7)
    m, n = 128, 256
    A = rng.standard_normal((m, n)).astype(np.float32)
    Ad = jnp.asarray(A, dtype)
    A_stored = np.asarray(Ad.astype(jnp.float32), np.float64)
    w = rng.standard_normal(n).astype(np.float32)
    v = rng.standard_normal(m).astype(np.float32)
    y = fused.a_matvec(Ad, jnp.asarray(w))
    t = fused.at_matvec(Ad, jnp.asarray(v))
    assert y.dtype == jnp.float32 and t.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y), A_stored @ w,
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), A_stored.T @ v,
                               rtol=2e-5, atol=1e-4)


def test_ata_apply_bf16_storage():
    """ata_apply with a bf16-STORED A (the split3 in-kernel path) matches
    the f64 reference computed from the stored (rounded) values."""
    rng = np.random.default_rng(8)
    m, n = 128, 256
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32),
                    jnp.bfloat16)
    A64 = np.asarray(A.astype(jnp.float32), np.float64)
    vm = rng.standard_normal(m).astype(np.float32)
    alpha = np.abs(rng.standard_normal(n)).astype(np.float32)
    wn = rng.standard_normal(n).astype(np.float32)
    y, t = fused.ata_apply(A, jnp.asarray(vm), jnp.asarray(alpha),
                           jnp.asarray(wn))
    t_ref = A64.T @ vm
    y_ref = A64 @ (alpha * t_ref + wn)
    np.testing.assert_allclose(np.asarray(t), t_ref, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5,
                               atol=1e-3 * (1 + np.abs(y_ref).max()))


def test_split3_reconstruction():
    """h1+h2+h3 reconstructs an f32 vector to ~2^-24 relative error."""
    rng = np.random.default_rng(9)
    v = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32)
                    * 10.0 ** rng.integers(-6, 6, (1, 512)))
    h1 = v.astype(jnp.bfloat16)
    r1 = v - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    back = (h1.astype(jnp.float32) + h2.astype(jnp.float32)
            + h3.astype(jnp.float32))
    err = np.abs(np.asarray(back - v)) / (np.abs(np.asarray(v)) + 1e-30)
    assert err.max() < 2e-7, err.max()
