"""bf16 A-storage (SolverOptions.a_storage) — VERDICT r1 item 3.

The batched/dense f32 route can keep the constraint matrix in bf16 HBM
(halving residency and every A-stream) while all arithmetic stays f32.
These tests pin (a) the option plumbing, (b) end-to-end convergence on
bf16-representable instances, and (c) the fused kernel's bf16 stripe path
against the XLA reference.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ipx
from ipx.problem.lp import LP


def _bf16_instance(seed, m, n):
    """Known-optimum feasible LP whose A is exactly bf16-representable."""
    r = np.random.default_rng(seed)
    A16 = jnp.asarray(r.standard_normal((m, n)) / np.sqrt(n),
                      jnp.float32).astype(jnp.bfloat16)
    Af = np.asarray(A16.astype(jnp.float32))
    perm = r.permutation(n)
    x_star = np.zeros(n)
    x_star[perm[:m]] = r.uniform(0.5, 2.0, m)
    s_star = np.zeros(n)
    s_star[perm[m:]] = r.uniform(0.5, 2.0, n - m)
    y_star = r.standard_normal(m)
    c = Af.T @ y_star + s_star
    b = Af @ x_star
    return A16, c, b, float(c @ x_star)


def test_options_validation():
    with pytest.raises(ValueError):
        ipx.SolverOptions(a_storage="float16")
    with pytest.raises(ValueError):
        ipx.SolverOptions(a_storage="bfloat16", dtype="float64")
    ipx.SolverOptions(a_storage="bfloat16")  # ok


def test_with_a_storage_idempotent():
    A16, c, b, _ = _bf16_instance(0, 16, 32)
    lp = LP(c=jnp.asarray(c, jnp.float32), A=A16.astype(jnp.float32),
            b=jnp.asarray(b, jnp.float32),
            obj_offset=jnp.zeros((), jnp.float32))
    opts = ipx.SolverOptions(a_storage="bfloat16")
    lp16 = lp.with_a_storage(opts)
    assert lp16.A.dtype == jnp.bfloat16
    assert lp16.with_a_storage(opts).A.dtype == jnp.bfloat16
    # f32 storage is a no-op (same object)
    assert lp.with_a_storage(ipx.SolverOptions()) is lp
    # b, c untouched
    assert lp16.b.dtype == jnp.float32 and lp16.c.dtype == jnp.float32


@pytest.mark.parametrize("matvec", ["xla", "fused"])
def test_solve_batch_bf16_storage(matvec):
    """bf16-stored batch converges to the 1e-6 contract on instances whose
    data is exactly bf16-representable (the bench construction)."""
    m, n, B = 64, 128, 3
    insts = [_bf16_instance(s, m, n) for s in range(B)]
    blp = LP(
        c=jnp.stack([jnp.asarray(c, jnp.float32) for _, c, _, _ in insts]),
        A=jnp.stack([a for a, _, _, _ in insts]),
        b=jnp.stack([jnp.asarray(b, jnp.float32) for _, _, b, _ in insts]),
        obj_offset=jnp.zeros((B,), jnp.float32))
    opts = ipx.SolverOptions(dtype="float32", a_storage="bfloat16",
                             matvec_backend=matvec)
    sols = ipx.solve_batch(blp, options=opts)
    for (_, _, _, obj_star), s in zip(insts, sols):
        assert s.optimal, s.status_name
        rel = abs(s.objective - obj_star) / (1 + abs(obj_star))
        assert rel <= 5e-6, f"obj err {rel:.2e}"


def test_fused_kernel_bf16_matches_xla():
    """ata_apply with a bf16-stored A == the XLA product on the upcast A."""
    from ipx.kernels import fused as fk
    r = np.random.default_rng(1)
    m, n = 128, 256
    A16 = jnp.asarray(r.standard_normal((m, n)), jnp.float32).astype(
        jnp.bfloat16)
    Af = A16.astype(jnp.float32)
    v = jnp.asarray(r.standard_normal(m), jnp.float32)
    alpha = jnp.asarray(r.uniform(0.5, 2.0, n), jnp.float32)
    w = jnp.asarray(r.standard_normal(n), jnp.float32)
    y, t = fk.ata_apply(A16, v, alpha, w)
    t_ref = Af.T @ v
    y_ref = Af @ (alpha * t_ref + w)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_assemble_symmetric_recursion():
    """Block-syrk assembly (lower triangle + mirror) == dense reference,
    exactly symmetric, for sizes that exercise base case and recursion."""
    from ipx.linsys.normal_eq import assemble
    r = np.random.default_rng(2)
    for m, n in [(40, 80), (256, 512), (300, 700)]:
        A = jnp.asarray(r.standard_normal((m, n)), jnp.float32)
        d2 = jnp.asarray(r.uniform(0.1, 10.0, n), jnp.float32)
        M = np.asarray(assemble(A, d2))
        ref = (np.asarray(A, np.float64) * np.asarray(d2, np.float64)
               ) @ np.asarray(A, np.float64).T
        assert np.abs(M - M.T).max() == 0.0
        rel = np.abs(M - ref).max() / np.abs(ref).max()
        assert rel < 5e-6, f"assembly err {rel:.2e} at m={m}"


def test_bf16_storage_composes_with_presolve():
    """presolve scaling must not silently round a bf16-exact instance:
    scale factors are snapped to powers of two when a_storage='bfloat16'
    (exact in binary FP), so the scaled A stays bf16-representable.
    Regression: arbitrary Ruiz factors gave OPTIMAL with a ~1e-3 objective
    error / rp_rel on exactly this construction (r4)."""
    import numpy as np
    import jax.numpy as jnp
    import ipx

    rng = np.random.default_rng(3)
    m, n = 96, 192
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
    sol = ipx.solve(c, A, b, options=ipx.SolverOptions(
        dtype="float32", a_storage="bfloat16"))
    rel = abs(sol.objective - obj_star) / (1 + abs(obj_star))
    assert sol.optimal, sol.status_name
    assert rel <= 2e-6, f"objective rel err {rel:.2e}"
    assert sol.rp_rel <= 1e-5, f"primal residual {sol.rp_rel:.2e}"


def test_presolve_pow2_scales_exact():
    """_pow2_round returns exact powers of two near the input scale."""
    import numpy as np
    from ipx.problem.presolve import _pow2_round

    v = np.array([0.3, 1.0, 1.5, 2.9, 1e-8, 7.3e5])
    p = _pow2_round(v)
    exps = np.log2(p)
    np.testing.assert_array_equal(exps, np.round(exps))
    assert np.all((p >= v / 2) & (p <= v * 2))
