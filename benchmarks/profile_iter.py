"""Stage-level ledger of one batched Mehrotra iteration (perf diagnosis).

Times each stage of the iteration separately with the same two-trip-count
device-fetch discipline as bench.py (the tunnel's block_until_ready lies),
chaining iterations through a data dependency so XLA cannot overlap or
dead-code-eliminate repeated applications.  Appends one JSON line per stage
to ``benchmarks/profile_iter.jsonl``.

Stages:
  step        — full mehrotra_step (the bench unit)
  factor      — assemble + Jacobi scale + potrf/pallas + W inversion
  assemble    — normal-matrix assembly alone
  precond     — one preconditioner apply (fused pair solve kernel)
  ata         — one fused A-resident normal-operator apply
  solve       — one normal_eq.solve (precond + CG refine_steps)

Usage: python benchmarks/profile_iter.py [--batch 128] [--m 1024] [--n 2048]
       [--a-storage bfloat16] [--chol-backend hybrid]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=6)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--a-storage", choices=["float32", "bfloat16"],
                    default="bfloat16")
    ap.add_argument("--chol-backend", choices=["xla", "pallas", "hybrid"],
                    default="hybrid")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import ipx
    from ipx.ipm import batched, mehrotra
    from ipx.linsys import normal_eq
    from ipx.problem.lp import LP

    B, m, n = args.batch, args.m, args.n
    opts = ipx.SolverOptions(dtype="float32", max_iter=32,
                             chol_backend=args.chol_backend, refine_steps=1,
                             matvec_backend="fused",
                             a_storage=args.a_storage)

    def _gen_one(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        A = jax.random.normal(k1, (m, n), jnp.float32) / jnp.sqrt(
            jnp.asarray(n, jnp.float32))
        if args.a_storage == "bfloat16":
            A = A.astype(jnp.bfloat16)
        Af = A.astype(jnp.float32)
        perm = jax.random.permutation(k2, n)
        x_star = jnp.zeros(n, jnp.float32).at[perm[:m]].set(
            jax.random.uniform(k3, (m,), jnp.float32, 0.5, 2.0))
        s_star = jnp.zeros(n, jnp.float32).at[perm[m:]].set(
            jax.random.uniform(k4, (n - m,), jnp.float32, 0.5, 2.0))
        y_star = jax.random.normal(k5, (m,), jnp.float32)
        return Af.T @ y_star + s_star, A, Af @ x_star

    c_d, A_d, b_d = jax.jit(jax.vmap(_gen_one))(
        jax.random.split(jax.random.PRNGKey(0), B))
    blp = LP(c=c_d, A=A_d, b=b_d, obj_offset=jnp.zeros((B,), jnp.float32))

    @functools.partial(jax.jit, static_argnums=(1,))
    def start(blp, opts):
        return batched.batch_starting_state(blp, opts)

    st0, fac_aat = jax.block_until_ready(start(blp, opts))
    d2_0 = st0.x / st0.s
    rhs_0 = st0.best_y + 1.0  # arbitrary O(1) vector, shape (B, m)

    # --- stage definitions: chained(carry) -> carry ------------------------
    one = jnp.asarray(1e-20, jnp.float32)

    def chain_step(k):
        @jax.jit
        def run(st):
            step = jax.vmap(
                lambda lp_i, s, f: mehrotra.mehrotra_step(lp_i, s, opts, f))
            return jax.lax.fori_loop(
                0, k, lambda _, s: step(blp, s, fac_aat), st)
        return run, st0, lambda out: float(np.asarray(out.mu).sum())

    def chain_factor(k):
        @jax.jit
        def run(d2):
            def body(_, d2):
                fac = jax.vmap(
                    lambda a, d: normal_eq.factor(a, d, opts))(blp.A, d2)
                # dependency: fold a cheap functional of L back into d2
                return d2 + one * jnp.abs(
                    jnp.diagonal(fac.L, axis1=-2, axis2=-1)[:, :1])
            return jax.lax.fori_loop(0, k, body, d2)
        return run, d2_0, lambda out: float(np.asarray(out).sum())

    def chain_assemble(k):
        @jax.jit
        def run(d2):
            def body(_, d2):
                M = jax.vmap(lambda a, d: normal_eq.assemble(
                    a.astype(jnp.float32) if a.dtype != jnp.float32 else a,
                    d, opts.assembly_precision))(blp.A, d2)
                return d2 + one * jnp.abs(M[:, 0, :1])
            return jax.lax.fori_loop(0, k, body, d2)
        return run, d2_0, lambda out: float(np.asarray(out).sum())

    fac0 = jax.block_until_ready(jax.jit(
        lambda: jax.vmap(lambda a, d: normal_eq.factor(a, d, opts))(
            blp.A, d2_0))())

    def chain_precond(k):
        @jax.jit
        def run(r):
            def body(_, r):
                from ipx.kernels import cholesky as pk
                if opts.chol_backend in ("pallas", "hybrid"):
                    y = pk.chol_solve_batched(fac0.L, fac0.W, r)
                else:
                    y = jax.vmap(lambda L, b: jax.scipy.linalg.cho_solve(
                        (L, True), b))(fac0.L, r)
                return r + one * y
            return jax.lax.fori_loop(0, k, body, r)
        return run, rhs_0, lambda out: float(np.asarray(out).sum())

    def chain_ata(k):
        from ipx.kernels import fused as fk

        @jax.jit
        def run(v):
            def body(_, v):
                y, _t = jax.vmap(lambda a, vv, d: fk.ata_apply(
                    a, vv, d, None))(blp.A, v, fac0.d2)
                return v + one * y
            return jax.lax.fori_loop(0, k, body, v)
        return run, rhs_0, lambda out: float(np.asarray(out).sum())

    def chain_solve(k):
        @jax.jit
        def run(r):
            def body(_, r):
                y = jax.vmap(lambda L, a, b: normal_eq.solve(
                    L, a, b, opts), in_axes=(0, 0, 0))(fac0, blp.A, r)
                return r + one * y
            return jax.lax.fori_loop(0, k, body, r)
        return run, rhs_0, lambda out: float(np.asarray(out).sum())

    stages = {
        "step": chain_step,
        "factor": chain_factor,
        "assemble": chain_assemble,
        "precond": chain_precond,
        "ata": chain_ata,
        "solve": chain_solve,
    }

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_iter.jsonl")
    cfg = {"batch": B, "m": m, "n": n, "a_storage": args.a_storage,
           "chol_backend": args.chol_backend}
    for name, mk in stages.items():
        try:
            times = {}
            for k in (args.k1, args.k2):
                run, x0, sync = mk(k)
                sync(run(x0))          # compile
                best = float("inf")
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    sync(run(x0))
                    best = min(best, time.perf_counter() - t0)
                times[k] = best
            per = (times[args.k2] - times[args.k1]) / (args.k2 - args.k1)
            rec = {"stage": name, "ms": round(per * 1e3, 3), **cfg}
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"stage": name, "error": f"{type(e).__name__}: {e}"[:200],
                   **cfg}
        print(json.dumps(rec), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
