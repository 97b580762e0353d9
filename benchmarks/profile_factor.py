"""Factor-variant ledger: times candidate factorization pipelines and
their components on random SPD batches (B, m, m), one stage per process
(tunnel compiles are minutes each; multi-stage sweeps time out).

Protocol: two trip counts k1<k2 chained through a small data dependency,
device->host scalar sync, min over repeats, (t2-t1)/(k2-k1).  Every stage
returns only (B, m)-sized carries — fetching a (B, m, m) result through
the tunnel drowns the signal in transfer variance (see profile_iter.py).

Stages:
  potrf        — jnp.linalg.cholesky on (B, m, m)          [hybrid's factor]
  potrf128     — jnp.linalg.cholesky on (8B, 128, 128)     [diag-block cost]
  trtri128     — _invert_lower_blocks on (8B, 128, 128)    [W-inversion cost]
  blocked      — _blocked_potrf nb=128 HIGHEST             [the new backend]
  blocked_high — _blocked_potrf nb=128 HIGH (3-pass syrk)
  blocked256   — _blocked_potrf nb=256 HIGHEST
  blocked256_high — nb=256 HIGH

Usage: python benchmarks/profile_factor.py --stages blocked_high
       [--batch 128] [--m 1024] [--k1 6] [--k2 18] [--repeats 3]
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
    ap.add_argument("--k1", type=int, default=6)
    ap.add_argument("--k2", type=int, default=18)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--stages", default="", help="comma-separated subset")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ipx.linsys import normal_eq

    B, m = args.batch, args.m
    HI = jax.lax.Precision.HIGH
    HP = jax.lax.Precision.HIGHEST

    @jax.jit
    def gen():
        G = jax.random.normal(jax.random.PRNGKey(0), (B, m, m), jnp.float32)
        Ms = jnp.matmul(G, jnp.swapaxes(G, 1, 2), precision=HP) / m
        return Ms + 0.1 * jnp.eye(m, dtype=jnp.float32)

    Ms0 = jax.block_until_ready(gen())
    one = jnp.asarray(1e-20, jnp.float32)

    def chained_full(fn):
        """fn: (B, m, m) -> functional (B, m) used to perturb the carry."""
        @functools.partial(jax.jit, static_argnums=(0,))
        def run(k, Ms):
            def body(_, Ms):
                return Ms + one * fn(Ms)[:, :, None]
            out = jax.lax.fori_loop(0, k, body, Ms)
            return jnp.diagonal(out, axis1=-2, axis2=-1)
        return run, (Ms0,)

    def stage_potrf():
        return chained_full(lambda Ms: jnp.abs(jnp.diagonal(
            jnp.linalg.cholesky(Ms), axis1=-2, axis2=-1)))

    def blocked_fn(nb, prec, diag="twolevel"):
        def f(Ms):
            L, W = jax.vmap(
                lambda M: normal_eq._blocked_potrf(M, nb, prec, diag))(Ms)
            return (jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1))
                    + jnp.mean(jnp.abs(W), axis=(1, 2, 3))[:, None])
        return f

    def blocked_left_fn(Ms):
        L, W = jax.vmap(lambda M: normal_eq._blocked_potrf_left(M, 128))(Ms)
        return (jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1))
                + jnp.mean(jnp.abs(W), axis=(1, 2, 3))[:, None])

    def small_blocks(Ms):
        # takes Ms as an ARGUMENT: closing over the 512MB batch embeds it
        # in the compile request and the axon tunnel rejects it (HTTP 413)
        nblk = m // 128
        return jnp.reshape(
            jnp.stack([Ms[:, j * 128:(j + 1) * 128, j * 128:(j + 1) * 128]
                       for j in range(nblk)], axis=1), (B * nblk, 128, 128))

    def chained_small(fn):
        D0 = jax.block_until_ready(jax.jit(small_blocks)(Ms0))

        @functools.partial(jax.jit, static_argnums=(0,))
        def run(k, D):
            def body(_, D):
                return D + one * fn(D)[:, :, None]
            out = jax.lax.fori_loop(0, k, body, D)
            return jnp.diagonal(out, axis1=-2, axis2=-1)
        return run, (D0,)

    def trsmsyrk_prec_fn(prec):
        def f(Ms):
            W0 = jnp.eye(128, dtype=jnp.float32) * 0.5
            T = Ms
            diags = []
            for o in range(0, m, 128):
                if m - o - 128 > 0:
                    P = jnp.matmul(T[:, 128:, :128], W0.T, precision=prec)
                    T = T[:, 128:, 128:] - jnp.matmul(
                        P, jnp.swapaxes(P, 1, 2), precision=prec)
                    diags.append(P[:, 0, :])
                else:
                    diags.append(T[:, 0, :128])
            return jnp.abs(jnp.concatenate(diags, axis=1)[:, :m])
        return f

    def trsmsyrk_fn(Ms):
        # The blocked factor's MATMUL chain in isolation: per panel one
        # (B, m-o, 128) @ (B, 128, 128) "TRSM-as-matmul" against a FIXED
        # W (no diag dependency) and one trailing (B, m-o, 128) @
        # (B, 128, m-o) syrk, shapes shrinking statically.  blocked -
        # trsmsyrk - diagchain ~ the overhead XLA adds stitching them.
        W0 = jnp.eye(128, dtype=jnp.float32) * 0.5
        T = Ms
        diags = []
        for o in range(0, m, 128):
            if m - o - 128 > 0:
                P = jnp.matmul(T[:, 128:, :128], W0.T, precision=HP)
                T = T[:, 128:, 128:] - jnp.matmul(
                    P, jnp.swapaxes(P, 1, 2), precision=HP)
                diags.append(P[:, 0, :])
            else:
                diags.append(T[:, 0, :128])
        return jnp.abs(jnp.concatenate(diags, axis=1)[:, :m])

    def diagchain_fn(Ms):
        # The SEQUENTIAL diag chain in isolation: 8 dependent two-level
        # 128-block factors (each feeds the next through a rank-1-ish
        # perturbation), batched over B — the serial-latency floor of the
        # blocked backend's critical path.
        from ipx.kernels import cholesky as pk
        D = Ms[:, :128, :128]
        acc = jnp.zeros((B, 128), jnp.float32)
        for _ in range(m // 128):
            Ld, Wd = pk._factor_block_twolevel(D, mosaic=False)
            d = jnp.abs(jnp.diagonal(Ld, axis1=-2, axis2=-1))
            acc = acc + d + jnp.mean(jnp.abs(Wd), axis=(1, 2))[:, None]
            D = D + 1e-6 * d[:, :, None]
        return jnp.tile(acc, (1, m // 128))

    stages = {
        "potrf": stage_potrf,
        "trsmsyrk": lambda: chained_full(trsmsyrk_fn),
        "diagchain": lambda: chained_full(diagchain_fn),
        "potrf128": lambda: chained_small(lambda D: jnp.abs(jnp.diagonal(
            jnp.linalg.cholesky(D), axis1=-2, axis2=-1))),
        "trtri128": lambda: chained_small(lambda D: jnp.mean(jnp.abs(
            normal_eq._invert_lower_blocks(jnp.tril(D) + 4.0 * jnp.eye(
                128, dtype=jnp.float32))), axis=(1, 2))[:, None]),
        "trsmsyrk_high": lambda: chained_full(trsmsyrk_prec_fn(HI)),
        "trsmsyrk_default": lambda: chained_full(
            trsmsyrk_prec_fn(jax.lax.Precision.DEFAULT)),
        "blocked": lambda: chained_full(blocked_fn(128, HP)),
        "blocked_left": lambda: chained_full(blocked_left_fn),
        "blocked_xladiag": lambda: chained_full(blocked_fn(128, HP, "xla")),
        "blocked_high": lambda: chained_full(blocked_fn(128, HI)),
        "blocked256": lambda: chained_full(blocked_fn(256, HP)),
        "blocked256_high": lambda: chained_full(blocked_fn(256, HI)),
    }
    subset = [s for s in args.stages.split(",") if s] or list(stages)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_factor.jsonl")
    for name in subset:
        try:
            fn, operands = stages[name]()
            times = {}
            for k in (args.k1, args.k2):
                float(np.asarray(fn(k, *operands)).sum())   # compile
                best = float("inf")
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    float(np.asarray(fn(k, *operands)).sum())
                    best = min(best, time.perf_counter() - t0)
                times[k] = best
            per = (times[args.k2] - times[args.k1]) / (args.k2 - args.k1)
            rec = {"stage": name, "ms": round(per * 1e3, 3),
                   "batch": B, "m": m}
        except Exception as e:  # noqa: BLE001
            rec = {"stage": name, "error": f"{type(e).__name__}: {e}"[:200],
                   "batch": B, "m": m}
        print(json.dumps(rec), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
