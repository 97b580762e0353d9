"""A/B the pipelined vs start-wait pair-solve kernel on the real chip.

Chained applications (x <- solve(LT, W, x)) force a data dependency so XLA
cannot overlap repeats; timing uses the two-trip-count device-fetch
discipline (bench.py) because block_until_ready through the tunnel lies.

Usage: python benchmarks/probe_pair_pipeline.py [--batch 256] [--m 1024]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=12)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    from ipx.kernels import cholesky as pk

    B, m = args.batch, args.m
    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, m, m)).astype(np.float32) / np.sqrt(m)
    M = A @ np.swapaxes(A, 1, 2) + np.eye(m, dtype=np.float32)
    L = np.linalg.cholesky(M)
    nblk = m // pk.NB
    W = np.stack([np.linalg.inv(L[:, k * pk.NB:(k + 1) * pk.NB,
                                  k * pk.NB:(k + 1) * pk.NB])
                  for k in range(nblk)], axis=1).astype(np.float32)
    LT = jnp.asarray(np.swapaxes(L, 1, 2))
    Wd = jnp.asarray(W)
    b = jnp.asarray(rng.standard_normal((B, m)).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("k", "pipeline"))
    def chain(LT, Wd, b, k: int, pipeline: bool):
        x = b
        for _ in range(k):
            x = pk._chol_solve_pair_lt_impl(LT, Wd, x, pipeline=pipeline)
            # renormalize so the chain stays finite
            x = x / jnp.sqrt(jnp.mean(x * x) + 1e-30)
        return x

    def fetch(x):
        return float(np.asarray(x).sum())

    for pipeline in (False, True):
        fetch(chain(LT, Wd, b, args.k1, pipeline))   # compile k1
        fetch(chain(LT, Wd, b, args.k2, pipeline))   # compile k2
        best = np.inf
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fetch(chain(LT, Wd, b, args.k1, pipeline))
            t1 = time.perf_counter()
            fetch(chain(LT, Wd, b, args.k2, pipeline))
            t2 = time.perf_counter()
            per = ((t2 - t1) - (t1 - t0)) / (args.k2 - args.k1) * 1e3
            best = min(best, per)
        # HBM floor: both sweeps read the strict-triangular factor once
        # (m^2/2 each) + W + vectors (all sizes in units of pk.NB so the
        # script tracks the kernel's block width — ADVICE r2 #3)
        bytes_per = B * (m * m * 4.0 + nblk * pk.NB * pk.NB * 4 + 4 * m * 4)
        floor_ms = bytes_per / 819e9 * 1e3
        print(f"pipeline={pipeline}: {best:.3f} ms/pair-solve "
              f"(B={B}, m={m}; HBM floor ~{floor_ms:.3f} ms, "
              f"{best / floor_ms:.2f}x off)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
