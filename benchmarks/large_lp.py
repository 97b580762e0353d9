"""Config-4 scale runner (VERDICT r1 item 4; BASELINE.json:10).

Runs ``ipx.solve_large`` — column-sharded Schur assembly + distributed
blocked Cholesky — at the largest real-chip-feasible sizes and appends one
JSON line per run to ``benchmarks/large_lp_results.jsonl``:

    {"m": ..., "n": ..., "p": ..., "status": "OPTIMAL", "iterations": ...,
     "rel_gap": ..., "seconds_total_incl_compile": ..., "seconds_solve_warm":
     ..., "seconds_compile_est": ..., "peak_bytes": ..., ...}

Timing split (VERDICT r3 weak #5): the first solve pays tracing+XLA
compilation (minutes through the axon remote-compile tunnel); ``--warm``
re-runs the identical solve in-process (jit cache hit) so
``seconds_solve_warm`` is pure device time and ``seconds_compile_est`` is
the difference.  ``peak_bytes`` records ``memory_stats()`` where the
platform exposes it; through the axon tunnel it does not, and the row says
so explicitly instead of a bare null.

The LP is generated ON DEVICE (a known-optimum feasible instance, the same
construction as problem.generate.random_feasible_lp) — at m=32k the A
matrix alone is 8GB and cannot ride the host->device tunnel.

Usage: python benchmarks/large_lp.py [--m 8192] [--n 0 (= 2m)] [--row 1]
       [--warm] [--platform cpu (virtual mesh: row>1 forces host devices)]
       [--sweep]   # m in {4096, 8192, 16384, 24576} until OOM
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(m: int, n: int, row: int, warm: bool,
            a_storage: str = "float32", project: bool = True,
            gondzio: int = 0, exec_chunk: int = 0) -> dict:
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import ipx
    from ipx import mesh as meshlib

    key = jax.random.PRNGKey(m)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    @jax.jit
    def gen():
        A = jax.random.normal(k1, (m, n), jnp.float32) / jnp.sqrt(
            jnp.asarray(n, jnp.float32))
        if a_storage == "bfloat16":
            # round the DATA to bf16 so bf16 storage is lossless: b, c and
            # the constructed optimum are then exact for the solved
            # instance (same recipe as bench.py's generator)
            A = A.astype(jnp.bfloat16).astype(jnp.float32)
        perm = jax.random.permutation(k2, n)
        x_star = jnp.zeros(n, jnp.float32).at[perm[:m]].set(
            jax.random.uniform(k3, (m,), jnp.float32, 0.5, 2.0))
        s_star = jnp.zeros(n, jnp.float32).at[perm[m:]].set(
            jax.random.uniform(k4, (n - m,), jnp.float32, 0.5, 2.0))
        y_star = jax.random.normal(k5, (m,), jnp.float32)
        # HIGHEST-precision construction (r5): at default precision these
        # dots run as single bf16 passes on TPU (the bf16-propagation
        # demotion is strongest when A is a bf16 round-trip), making
        # (x*, y*, s*) optimal only to ~4e-4 for the GENERATED instance —
        # obj_rel_err_vs_known then measured generator error, not solver
        # error (m=4096 bf16: OPTIMAL at rel_gap 1.1e-8 with "obj err"
        # 8.5e-4 — impossible for a true optimum).
        hp = jax.lax.Precision.HIGHEST
        c = jnp.matmul(A.T, y_star, precision=hp) + s_star
        b = jnp.matmul(A, x_star, precision=hp)
        if a_storage == "bfloat16":
            A = A.astype(jnp.bfloat16)   # lossless: rounded above
        return c, A, b, jnp.vdot(c, x_star, precision=hp)

    c, A, b, obj_star = gen()
    obj_star = float(obj_star)
    mesh = meshlib.make_mesh(batch=1, row=row)
    opts = ipx.SolverOptions(dtype="float32", a_storage=a_storage,
                             project_feasibility=project,
                             gondzio_correctors=gondzio)
    t0 = time.perf_counter()
    sol = ipx.solve_large(c, A, b, mesh=mesh, options=opts,
                          exec_chunk_iters=exec_chunk)
    dt = time.perf_counter() - t0
    t_warm = None
    if warm:
        # identical call => in-process jit cache hit: pure device time
        t1 = time.perf_counter()
        sol = ipx.solve_large(c, A, b, mesh=mesh, options=opts,
                              exec_chunk_iters=exec_chunk)
        t_warm = time.perf_counter() - t1
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)() or {}
    peak = stats.get("peak_bytes_in_use")
    rel_err = abs(sol.objective - obj_star) / (1 + abs(obj_star))
    rec = {
        "m": m, "n": n, "p": row, "a_storage": a_storage,
        "project_feasibility": project, "gondzio_correctors": gondzio,
        "exec_chunk_iters": exec_chunk,
        "status": sol.status_name, "iterations": sol.iterations,
        "rel_gap": sol.rel_gap, "rp_rel": sol.rp_rel, "rd_rel": sol.rd_rel,
        "obj_rel_err_vs_known": rel_err,
        "seconds_total_incl_compile": round(dt, 2),
        "platform": dev.platform,
    }
    if t_warm is not None:
        rec["seconds_solve_warm"] = round(t_warm, 2)
        rec["seconds_compile_est"] = round(dt - t_warm, 2)
        if t_warm > dt:
            # seen once at m=16384: the warm rerun took LONGER than the
            # first call incl. compile — tunnel-side sync/variance, not a
            # real split; flag so a reader doesn't trust the negative est
            rec["timing_note"] = ("warm rerun slower than first call "
                                  "(tunnel sync variance): compile/solve "
                                  "split unreliable for this row")
    if peak is not None:
        rec["peak_bytes"] = peak
    else:
        rec["peak_bytes"] = None
        rec["peak_bytes_note"] = ("memory_stats() not exposed by this "
                                  "platform/backend (axon tunnel hides it "
                                  "on tpu; jax cpu has none)")
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8192)
    ap.add_argument("--n", type=int, default=0, help="0 = 2m")
    ap.add_argument("--row", type=int, default=1)
    ap.add_argument("--a-storage", choices=["float32", "bfloat16"],
                    default="float32",
                    help="bf16 A storage (instance rounded to bf16 so it "
                         "stays exact): halves A residency — the m=32k "
                         "config needs it on a 16GB chip")
    ap.add_argument("--no-project", action="store_true",
                    help="disable the feasibility projection: its "
                         "loop-invariant AA^T factor keeps a second (m, m) "
                         "panel alive for the whole solve — 4.3GB at "
                         "m=32k, the difference between fitting and not")
    ap.add_argument("--warm", action="store_true",
                    help="re-run the identical solve once (jit cache hit) "
                         "to split compile vs device time in the row")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                    help="cpu = virtual mesh (row>1 devices forced via "
                         "XLA_FLAGS before jax import)")
    ap.add_argument("--exec-chunk", type=int, default=0,
                    help="cap each device execution at this many IPM "
                         "iterations and resume in process (the m>=24k "
                         "single-execution device-fault workaround; see "
                         "ipx.api.solve_large)")
    ap.add_argument("--gondzio", type=int, default=0,
                    help="Gondzio centrality correctors (VERDICT r4 item 6: "
                         "the m=1024 'keep 0' verdict re-tested at a scale "
                         "where the factor dominates the step)")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--out", default=None,
                    help="output jsonl (default: large_lp_results.jsonl)")
    args = ap.parse_args()

    if args.platform == "cpu" and args.row > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                        f"{args.row}").strip()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "large_lp_results.jsonl")
    sizes = ([4096, 8192, 16384, 24576] if args.sweep else [args.m])
    for m in sizes:
        n = args.n or 2 * m
        try:
            rec = run_one(m, n, args.row, args.warm, args.a_storage,
                          project=not args.no_project,
                          gondzio=args.gondzio, exec_chunk=args.exec_chunk)
        except Exception as e:  # noqa: BLE001 — record OOM/compile failures
            rec = {"m": m, "n": n, "p": args.row,
                   "status": f"ERROR: {type(e).__name__}",
                   "error": str(e)[:300]}
        print(json.dumps(rec), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if str(rec.get("status", "")).startswith("ERROR"):
            break
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
