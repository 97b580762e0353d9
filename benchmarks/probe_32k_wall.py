"""Isolate the m=24k/32k config-4 failure stage (round 5).

Every 24576/32768 attempt dies with UNAVAILABLE "TPU device error" (or a
remote-compile HTTP 500) before any solver output.  This probe runs the
pipeline one stage at a time with explicit sync points so the failing
stage is pinned in the committed record:

  1. gen      — on-device instance generation (A bf16, b, c)
  2. assemble — sharded split3 assembly into the (m, m) panel + Jacobi
  3. factor   — in-place scan Cholesky of the panel
  4. solve1   — one preconditioned solve (lower+upper substitution)

Usage: python benchmarks/probe_32k_wall.py --m 24576 [--stage N]
Each stage prints a JSON line with ok/seconds; run stops at first failure.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=24576)
    ap.add_argument("--stages", type=int, default=4)
    args = ap.parse_args()
    m = args.m
    n = 2 * m

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import ipx
    from ipx import mesh as meshlib
    from ipx.linsys import schur, normal_eq

    def report(stage, t0, ok=True, err=None, extra=None):
        rec = {"m": m, "stage": stage, "ok": ok,
               "seconds": round(time.perf_counter() - t0, 2)}
        if err:
            rec["error"] = str(err)[:300]
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

    key = jax.random.PRNGKey(m)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    # stage 1: generation
    t0 = time.perf_counter()
    try:
        @jax.jit
        def gen():
            A = jax.random.normal(k1, (m, n), jnp.float32) / jnp.sqrt(
                jnp.asarray(n, jnp.float32))
            A = A.astype(jnp.bfloat16)
            x_star = jax.random.uniform(k3, (n,), jnp.float32, 0.5, 2.0)
            y_star = jax.random.normal(k5, (m,), jnp.float32)
            Af32 = lambda v: (A.astype(jnp.float32) @ v)
            b = Af32(x_star)
            c = (A.astype(jnp.float32).T @ y_star)
            return A, b, c
        A, b, c = gen()
        s = float(np.asarray(jnp.sum(b) + jnp.sum(c)))
        report("gen", t0, extra={"checksum_finite": bool(np.isfinite(s))})
    except Exception as e:  # noqa: BLE001
        report("gen", t0, ok=False, err=e)
        return 1
    if args.stages < 2:
        return 0

    mesh = meshlib.make_mesh(batch=1, row=1)
    opts = ipx.SolverOptions(dtype="float32", a_storage="bfloat16",
                             linsys="sharded")
    d2 = jnp.ones((n,), jnp.float32)

    # stage 2+3: assembly + factor (schur.factor does both)
    t0 = time.perf_counter()
    try:
        with schur.use_mesh(mesh):
            fac = jax.jit(
                lambda A_, d2_: normal_eq.factor(A_, d2_, opts))(A, d2)
        ok = bool(np.asarray(fac.ok))
        report("assemble+factor", t0, extra={"factor_ok": ok})
    except Exception as e:  # noqa: BLE001
        report("assemble+factor", t0, ok=False, err=e)
        return 1
    if args.stages < 4:
        return 0

    # stage 4: one preconditioned solve
    t0 = time.perf_counter()
    try:
        with schur.use_mesh(mesh):
            y = jax.jit(
                lambda f, A_, r: normal_eq.solve(f, A_, r, opts))(fac, A, b)
        s = float(np.asarray(jnp.sum(y)))
        report("solve1", t0, extra={"checksum_finite": bool(np.isfinite(s))})
    except Exception as e:  # noqa: BLE001
        report("solve1", t0, ok=False, err=e)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
