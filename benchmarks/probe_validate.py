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
    p.add_argument("--proj-cg-iters", type=int, default=0)
    p.add_argument("--refine-solve-cg", type=int, default=0)
    p.add_argument("--a-storage", choices=["float32", "bfloat16"],
                    default="bfloat16")
    p.add_argument("--matvec", choices=["fused", "xla"], default="fused")
    p.add_argument("--library-defaults", action="store_true",
                    help="ignore every tuning flag: run SolverOptions() "
                         "robust defaults (f32 A) with only max_iter and "
                         "augmented_fallback=False applied — the reliability "
                         "reference point")
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
        if args.a_storage == "float32":
            A = A.astype(jnp.float32)   # same rounded instance, f32-stored
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
    if args.library_defaults:
        opts = ipx.SolverOptions(dtype="float32", max_iter=args.max_iter,
                                 augmented_fallback=False)
    else:
        opts = ipx.SolverOptions(
            dtype="float32", max_iter=args.max_iter,
            chol_backend=args.chol_backend, refine_steps=args.cg,
            matvec_backend=args.matvec,
            refine_solve_cg=args.refine_solve_cg,
            proj_cg_iters=args.proj_cg_iters,
            a_storage=args.a_storage, augmented_fallback=False, **kw)

    sols = ipx.solve_batch(blp, options=opts)
    statuses = [s.status_name for s in sols]
    gaps = [s.rel_gap for s in sols]
    iters = [s.iterations for s in sols]
    n_opt = sum(s.optimal for s in sols)
    print(json.dumps({
        "config": {"library_defaults": args.library_defaults,
                   "a_storage": args.a_storage, "matvec": args.matvec,
                   "chol_backend": args.chol_backend,
                   "refactor_period": args.refactor_period,
                   "stale_cg": args.stale_cg, "refines": args.refines,
                   "corrector_refines": args.corrector_refines,
                   "cg": args.cg, "proj_cg": args.proj_cg_iters,
                   "refine_solve_cg": args.refine_solve_cg,
                   "assembly_precision": args.assembly_precision},
        "count": B, "optimal": n_opt,
        "statuses": statuses,
        "max_rel_gap_of_optimal": float(max(
            (g for g, s in zip(gaps, sols) if s.optimal), default=np.nan)),
        "iters_median": float(np.median(iters)),
        "iters_max": int(max(iters)),
        # how close the failures got (near-miss vs hard stall adjudicates
        # whether the honest fix is more refinement or a looser exit)
        "non_optimal": [
            {"status": s.status_name, "rel_gap": float(s.rel_gap),
             "rp_rel": float(s.rp_rel), "rd_rel": float(s.rd_rel),
             "iters": int(s.iterations)}
            for s in sols if not s.optimal],
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
