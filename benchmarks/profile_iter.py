"""Stage-level ledger of one batched Mehrotra iteration (perf diagnosis).

Times each stage of the iteration separately with the same two-trip-count
device-fetch discipline as bench.py (the tunnel's block_until_ready lies),
chaining iterations through a data dependency so XLA cannot overlap or
dead-code-eliminate repeated applications.  Appends one JSON line per stage
to ``benchmarks/profile_iter.jsonl``.

All large operands are passed as jit ARGUMENTS (never closures: a closed-
over 512MB batch is embedded in the compile request and the axon
remote-compile tunnel rejects it with HTTP 413).

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
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    ap.add_argument("--chol-backend",
                    choices=["xla", "pallas", "pallas_left", "panels",
                             "hybrid", "blocked", "blocked_left"],
                    default="blocked_left")
    ap.add_argument("--refine-solve-cg", type=int, default=0)
    ap.add_argument("--proj-cg-iters", type=int, default=0)
    ap.add_argument("--stages", default="",
                    help="comma-separated subset (default: all)")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                    help="force a jax platform (cpu = smoke-test the "
                         "harness; the JAX_PLATFORMS env var is ignored "
                         "under the axon plugin)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import ipx
    from ipx.ipm import batched, mehrotra
    from ipx.linsys import normal_eq
    from ipx.problem.lp import LP

    B, m, n = args.batch, args.m, args.n
    opts = ipx.SolverOptions(dtype="float32", max_iter=32,
                             chol_backend=args.chol_backend, refine_steps=1,
                             matvec_backend="fused",
                             refine_solve_cg=args.refine_solve_cg,
                             proj_cg_iters=args.proj_cg_iters,
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

    one = jnp.asarray(1e-20, jnp.float32)

    @functools.partial(jax.jit, static_argnums=(2,))
    def factor_fn(blp, d2, opts):
        return jax.vmap(lambda a, d: normal_eq.factor(a, d, opts))(blp.A, d2)

    fac0 = jax.block_until_ready(factor_fn(blp, d2_0, opts))
    # pallas-family factors carry only the transposed layout LT (or the
    # suffix-only panel tuple LTp for pallas_left); derive both dense
    # orientations once here so every stage gets its native operand
    if len(fac0.LTp):
        nblk0 = len(fac0.LTp)
        LT0 = jnp.concatenate(
            [jnp.pad(p, ((0, 0), (0, 0), (kk * 128, 0)))
             for kk, p in enumerate(fac0.LTp)], axis=1)
        L0 = jnp.swapaxes(LT0, -1, -2)
    else:
        has_lt = fac0.LT.ndim >= 2
        L0 = jnp.swapaxes(fac0.LT, -1, -2) if has_lt else fac0.L
        LT0 = fac0.LT if has_lt else jnp.swapaxes(fac0.L, -1, -2)

    # --- stage definitions: (k) -> (jitted fn, operand tuple, sync) --------
    # Every stage fn takes (k static, *operands) — operands donated nothing,
    # all passed by argument so the compile request stays small.

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_step(k, blp, st, fac_aat):
        step = jax.vmap(
            lambda lp_i, s, f: mehrotra.mehrotra_step(lp_i, s, opts, f))
        return jax.lax.fori_loop(0, k, lambda _, s: step(blp, s, fac_aat), st)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_factor(k, blp, d2):
        def body(_, d2):
            fac = jax.vmap(lambda a, d: normal_eq.factor(a, d, opts))(
                blp.A, d2)
            # consume L, W AND j: folding only diag(L) back lets XLA
            # dead-code-eliminate the entire W inversion (measured: "factor"
            # came out ~= assemble + potrf alone)
            if len(fac.LTp):
                used = jnp.abs(fac.j[:, :1])
                for p_ in fac.LTp:
                    used = used + jnp.mean(jnp.abs(p_), axis=(1, 2))[:, None]
            else:
                Ld = fac.LT if fac.LT.ndim >= 2 else fac.L
                used = (jnp.abs(jnp.diagonal(Ld, axis1=-2, axis2=-1)[:, :1])
                        + jnp.abs(fac.j[:, :1]))
            if fac.W.ndim >= 3:
                used = used + jnp.mean(jnp.abs(fac.W), axis=(1, 2, 3))[:, None]
            return d2 + one * used
        return jax.lax.fori_loop(0, k, body, d2)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_assemble(k, blp, d2):
        def body(_, d2):
            M = jax.vmap(lambda a, d: normal_eq.assemble(
                a.astype(jnp.float32) if a.dtype != jnp.float32 else a,
                d, opts.assembly_precision))(blp.A, d2)
            # FULL reduction of M: folding back a single element lets XLA
            # slice-propagate away all but one row of the assembly (the
            # r2 ledger's "assemble 4 ms" was measuring ~1/m of the work)
            return d2 + one * jnp.mean(jnp.abs(M), axis=(1, 2))[:, None]
        return jax.lax.fori_loop(0, k, body, d2)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_precond(k, L, LT, W, r):
        from ipx.kernels import cholesky as pk

        def body(_, r):
            if opts.chol_backend in ("pallas", "hybrid",
                                     "blocked", "blocked_left"):
                y = pk.chol_solve_batched_lt(LT, W, r)
            else:
                y = jax.vmap(lambda Lk, b: jax.scipy.linalg.cho_solve(
                    (Lk, True), b))(L, r)
            return r + one * y
        return jax.lax.fori_loop(0, k, body, r)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_precond_panels(k, fac, r):
        from ipx.kernels import cholesky as pk

        def body(_, r):
            y = pk.chol_solve_batched_panels(fac.LTp, fac.W, r)
            return r + one * y
        return jax.lax.fori_loop(0, k, body, r)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_fused_diag(k, A, d2):
        # the fused factor path's Jacobi-scale matvec: does XLA fuse the
        # square+upcast into the reduction or materialize f32 A?
        def body(_, d2):
            diag = jnp.einsum("bmn,bn->bm", jnp.square(A.astype(jnp.float32)),
                              d2, precision=jax.lax.Precision.HIGHEST)
            return d2 + one * jnp.mean(diag, axis=1)[:, None]
        return jax.lax.fori_loop(0, k, body, d2)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_panels_factor(k, Ms):
        from ipx.kernels import cholesky as pk

        def body(_, Ms):
            panels, W = pk.factor_lt_panels(Ms)
            used = jnp.mean(jnp.abs(W), axis=(1, 2, 3))
            for p in panels:
                used = used + jnp.mean(jnp.abs(p), axis=(1, 2))
            return Ms + one * used[:, None, None]
        out = jax.lax.fori_loop(0, k, body, Ms)
        return jnp.diagonal(out, axis1=-2, axis2=-1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_assemble_kernel(k, A, d2):
        # the IN-STEP assembly for bf16 A: the whole-A-resident Mosaic
        # split3 kernel (the plain "assemble" stage upcasts A to f32 first,
        # so it measures the XLA block-recursive route instead)
        from ipx.kernels import cholesky as pk

        def body(_, d2):
            M = pk.assemble_sym_batched(A, d2)
            return d2 + one * jnp.mean(jnp.abs(M), axis=(1, 2))[:, None]
        return jax.lax.fori_loop(0, k, body, d2)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_panels_xla_factor(k, Ms):
        # the "panels" backend's factor: XLA left-looking, suffix-only
        # panel outputs (normal_eq._blocked_potrf_left_panels)
        def body(_, Ms):
            panels, W = jax.vmap(
                lambda M: normal_eq._blocked_potrf_left_panels(M, 128))(Ms)
            used = jnp.mean(jnp.abs(W), axis=(1, 2, 3))
            for p in panels:
                used = used + jnp.mean(jnp.abs(p), axis=(1, 2))
            return Ms + one * used[:, None, None]
        out = jax.lax.fori_loop(0, k, body, Ms)
        return jnp.diagonal(out, axis1=-2, axis2=-1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_ata(k, A, d2, v):
        from ipx.kernels import fused as fk

        def body(_, v):
            y, _t = jax.vmap(lambda a, vv, d: fk.ata_apply(
                a, vv, d, None))(A, v, d2)
            return v + one * y
        return jax.lax.fori_loop(0, k, body, v)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_solve(k, fac, A, r):
        def body(_, r):
            y = jax.vmap(lambda f, a, b: normal_eq.solve(
                f, a, b, opts), in_axes=(0, 0, 0))(fac, A, r)
            return r + one * y
        return jax.lax.fori_loop(0, k, body, r)

    # --- factor sub-stages (potrf / W inversion / scale+reg) ---------------
    Ms0 = jax.block_until_ready(jax.jit(lambda L: jnp.matmul(
        jnp.tril(L), jnp.swapaxes(jnp.tril(L), 1, 2)))(L0))

    # NOTE on carries: every stage fn RETURNS only small arrays (vectors /
    # scalars).  Returning the (B, m, m) carry makes the sync fetch 512MB
    # through the tunnel per call, whose throughput variance swamps the
    # timing signal entirely (measured: "potrf 162ms" inside a 124ms/iter
    # bench — impossible).  The matrix carries below are reduced ON DEVICE
    # to a (B, m) diagonal before returning.

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_potrf(k, Ms):
        def body(_, Ms):
            L = jnp.linalg.cholesky(Ms)
            return Ms + one * jnp.abs(
                jnp.diagonal(L, axis1=-2, axis2=-1))[:, :, None]
        out = jax.lax.fori_loop(0, k, body, Ms)
        return jnp.diagonal(out, axis1=-2, axis2=-1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_winv(k, L):
        from ipx.kernels import cholesky as pk

        def body(_, L):
            nblk = L.shape[-1] // pk.NB
            blocks = jnp.stack(
                [L[:, j * pk.NB:(j + 1) * pk.NB, j * pk.NB:(j + 1) * pk.NB]
                 for j in range(nblk)], axis=1)
            W = jax.vmap(normal_eq._invert_lower_blocks)(blocks)
            # full reduction of W: a single-element pick would let XLA
            # slice-propagate away most of the inversion work
            return L + one * jnp.mean(jnp.abs(W), axis=(1, 2, 3))[:, None,
                                                                  None]
        out = jax.lax.fori_loop(0, k, body, L)
        return jnp.diagonal(out, axis1=-2, axis2=-1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_blocked_factor(k, Ms):
        def body(_, Ms):
            Lb, Wb = jax.vmap(
                lambda M: normal_eq._blocked_potrf(M, 128))(Ms)
            return Ms + one * (jnp.abs(
                jnp.diagonal(Lb, axis1=-2, axis2=-1))
                + jnp.mean(jnp.abs(Wb), axis=(1, 2, 3))[:, None])[:, :, None]
        out = jax.lax.fori_loop(0, k, body, Ms)
        return jnp.diagonal(out, axis1=-2, axis2=-1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_pallas_factor(k, Ms):
        from ipx.kernels import cholesky as pk

        def body(_, Ms):
            L, W = pk.cholesky_batched(Ms)
            return Ms + one * (jnp.abs(
                jnp.diagonal(L, axis1=-2, axis2=-1))
                + jnp.mean(jnp.abs(W), axis=(1, 2, 3))[:, None])[:, :, None]
        out = jax.lax.fori_loop(0, k, body, Ms)
        return jnp.diagonal(out, axis1=-2, axis2=-1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_pallas_left_factor(k, Ms):
        from ipx.kernels import cholesky as pk

        def body(_, Ms):
            LT, W = pk.factor_lt_batched(Ms)
            return Ms + one * (jnp.abs(
                jnp.diagonal(LT, axis1=-2, axis2=-1))
                + jnp.mean(jnp.abs(W), axis=(1, 2, 3))[:, None])[:, :, None]
        out = jax.lax.fori_loop(0, k, body, Ms)
        return jnp.diagonal(out, axis1=-2, axis2=-1)

    # --- solve sub-stages: where do the ~3ms beyond (2 precond + 2 ata) go?
    @functools.partial(jax.jit, static_argnums=(0,))
    def run_cgchain(k, LT, W, A, d2, r):
        """precond -> ata -> precond -> ata serial chain, NO CG vdots —
        the pure stage-latency floor of one refine_steps=1 solve."""
        from ipx.kernels import cholesky as pk
        from ipx.kernels import fused as fk

        def body(_, r):
            y = pk.chol_solve_batched_lt(LT, W, r)
            t, _ = jax.vmap(lambda a, vv, d: fk.ata_apply(a, vv, d, None))(
                A, y, d2)
            z = pk.chol_solve_batched_lt(LT, W, r - t)
            t2, _ = jax.vmap(lambda a, vv, d: fk.ata_apply(a, vv, d, None))(
                A, z, d2)
            return r + one * (y + t2)
        return jax.lax.fori_loop(0, k, body, r)

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_precond_vmapped(k, fac, r):
        """The pair solve AS normal_eq.solve calls it: per-instance
        _chol_solve under vmap (L[None] batch-1 kernel calls) — vs the
        direct (B, m, m) batch of the "precond" stage."""
        def body(_, r):
            y = jax.vmap(lambda f, b: normal_eq._chol_solve(
                f, b, opts.chol_backend))(fac, r)
            return r + one * y
        return jax.lax.fori_loop(0, k, body, r)

    def sync_state(out):
        return float(np.asarray(out.mu).sum())

    def sync_arr(out):
        return float(np.asarray(out).sum())

    stages = {
        "step": (run_step, (blp, st0, fac_aat), sync_state),
        "factor": (run_factor, (blp, d2_0), sync_arr),
        "assemble": (run_assemble, (blp, d2_0), sync_arr),
        "assemble_kernel": (run_assemble_kernel, (blp.A, d2_0), sync_arr),
        "precond": (run_precond, (L0, LT0, fac0.W, rhs_0), sync_arr),
        "ata": (run_ata, (blp.A, fac0.d2, rhs_0), sync_arr),
        "solve": (run_solve, (fac0, blp.A, rhs_0), sync_arr),
        "potrf": (run_potrf, (Ms0,), sync_arr),
        "winv": (run_winv, (L0,), sync_arr),
        "blocked_factor": (run_blocked_factor, (Ms0,), sync_arr),
        "pallas_factor": (run_pallas_factor, (Ms0,), sync_arr),
        "pallas_left_factor": (run_pallas_left_factor, (Ms0,), sync_arr),
        "panels_factor": (run_panels_factor, (Ms0,), sync_arr),
        "panels_xla_factor": (run_panels_xla_factor, (Ms0,), sync_arr),
        "precond_panels": (run_precond_panels, (fac0, rhs_0), sync_arr),
        "fused_diag": (run_fused_diag, (blp.A, d2_0), sync_arr),
        "cgchain": (run_cgchain,
                    (LT0, fac0.W, blp.A, fac0.d2, rhs_0), sync_arr),
        "precond_vmapped": (run_precond_vmapped, (fac0, rhs_0), sync_arr),
    }
    subset = [s for s in args.stages.split(",") if s]
    if subset:
        stages = {k: v for k, v in stages.items() if k in subset}

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_iter.jsonl")
    cfg = {"batch": B, "m": m, "n": n, "a_storage": args.a_storage,
           "chol_backend": args.chol_backend}
    def measure(fn, operands, sync, k1, k2, repeats):
        times = {}
        for k in (k1, k2):
            sync(fn(k, *operands))          # compile
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                sync(fn(k, *operands))
                best = min(best, time.perf_counter() - t0)
            times[k] = best
        return (times[k2] - times[k1]) / (k2 - k1)

    for name, (fn, operands, sync) in stages.items():
        try:
            per = measure(fn, operands, sync, args.k1, args.k2, args.repeats)
            if per <= 0:
                # Sanity guard (VERDICT r2 weak #2: a -37.9ms "assemble" was
                # committed once): a non-positive two-trip-count difference
                # means either XLA hoisted the loop body (k2 didn't do k2x
                # the work) or tunnel noise swamped the signal.  Re-measure
                # once with 4x the trip counts — the larger spread drowns
                # fixed noise — and refuse to record a number if it is
                # STILL non-positive.
                per = measure(fn, operands, sync, 4 * args.k1, 4 * args.k2,
                              args.repeats)
            if per <= 0:
                rec = {"stage": name, "ms": None,
                       "error": "non-positive stage time after remeasure "
                                "(loop body hoisted or noise > signal)",
                       **cfg}
            else:
                rec = {"stage": name, "ms": round(per * 1e3, 3), **cfg}
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"stage": name, "error": f"{type(e).__name__}: {e}"[:200],
                   **cfg}
        print(json.dumps(rec), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
