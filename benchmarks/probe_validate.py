"""Wider no-rescue convergence validation for a bench config (round 5).

The bench harness's honest probe covers 4 instances; before a config is
shipped as the HEADLINE default its no-rescue convergence is validated on a
wider sample here (default 16 distinct on-device instances, the same
generator and seeds family as bench.py).

Usage: python benchmarks/probe_validate.py [--count 16] [--chol-backend
       pallas_left] [--refactor-period 2] [--refines 1] ...
Prints one JSON line: statuses, max rel gap, iteration stats.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--count", type=int, default=16)
    p.add_argument("--m", type=int, default=1024)
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--chol-backend", default="pallas_left")
    p.add_argument("--refactor-period", type=int, default=1)
    p.add_argument("--stale-cg", type=int, default=2)
    p.add_argument("--refines", type=int, default=2)
    p.add_argument("--corrector-refines", type=int, default=-1)
    p.add_argument("--cg", type=int, default=1)
    p.add_argument("--assembly-precision", default="highest")
    p.add_argument("--max-iter", type=int, default=48)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import ipx
    from ipx.problem.lp import LP

    m, n, B = args.m, args.n, args.count

    def _gen_one(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        A = jax.random.normal(k1, (m, n), jnp.float32) / jnp.sqrt(
            jnp.asarray(n, jnp.float32))
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
        jax.random.split(jax.random.PRNGKey(1), B))
    blp = LP(c=c_d, A=A_d, b=b_d, obj_offset=jnp.zeros((B,), jnp.float32))

    kw = {}
    if args.refactor_period != 1:
        kw["refactor_period"] = args.refactor_period
        kw["stale_solve_cg"] = args.stale_cg
    if args.refines != 2:
        kw["kkt_refine_steps"] = args.refines
        kw["predictor_refine_steps"] = args.refines
    if args.corrector_refines >= 0:
        kw["kkt_refine_steps"] = args.corrector_refines
    if args.assembly_precision != "highest":
        kw["assembly_precision"] = args.assembly_precision
    opts = ipx.SolverOptions(
        dtype="float32", max_iter=args.max_iter,
        chol_backend=args.chol_backend, refine_steps=args.cg,
        matvec_backend="fused", refine_solve_cg=0, proj_cg_iters=0,
        a_storage="bfloat16", augmented_fallback=False, **kw)

    sols = ipx.solve_batch(blp, options=opts)
    statuses = [s.status_name for s in sols]
    gaps = [s.rel_gap for s in sols]
    iters = [s.iterations for s in sols]
    n_opt = sum(s.optimal for s in sols)
    print(json.dumps({
        "config": {"chol_backend": args.chol_backend,
                   "refactor_period": args.refactor_period,
                   "stale_cg": args.stale_cg, "refines": args.refines,
                   "corrector_refines": args.corrector_refines,
                   "cg": args.cg,
                   "assembly_precision": args.assembly_precision},
        "count": B, "optimal": n_opt,
        "statuses": statuses,
        "max_rel_gap_of_optimal": float(max(
            (g for g, s in zip(gaps, sols) if s.optimal), default=np.nan)),
        "iters_median": float(np.median(iters)),
        "iters_max": int(max(iters)),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
