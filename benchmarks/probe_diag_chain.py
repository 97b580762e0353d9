"""Probe: per-application cost of the 128x128 diag-block factor chain.

The left-looking Mosaic factor (kernels/cholesky._factor_lt_kernel) runs
one _factor_block_twolevel per (panel, chunk); at BF=4 that is 512
sequential chains per B=256 factor call.  This probe measures the chain's
per-application latency as a function of the sub-batch it amortizes over:

  mosaic-BSd: a grid=(1,) kernel applying the chain REPS times to a
              resident (BSd, 128, 128) VMEM block
  xla-B:      the same chain (mosaic=False) jitted at the full batch

to decide where the chain must live (in-kernel at which BSd, or at the
XLA level amortized over the whole batch).  Timing: two-trip-count
device-fetch discipline (bench.py).

Usage: python benchmarks/probe_diag_chain.py [--reps 8]
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
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=6)
    ap.add_argument("--reps", type=int, default=8,
                    help="chain applications per timed unit (= panels)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    from ipx.kernels import cholesky as pk

    rng = np.random.default_rng(0)

    def spd(bs):
        A = rng.standard_normal((bs, 128, 128)).astype(np.float32) / 12.0
        return A @ np.swapaxes(A, 1, 2) + np.eye(128, dtype=np.float32)

    def fetch(x):
        return float(np.asarray(x).sum())

    def bench(fn, ops):
        fetch(fn(args.k1, *ops))
        fetch(fn(args.k2, *ops))
        ts = {}
        for k in (args.k1, args.k2):
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                fetch(fn(k, *ops))
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        return (ts[args.k2] - ts[args.k1]) / (args.k2 - args.k1)

    # --- in-kernel chain at sub-batch BSd --------------------------------
    for BSd in (4, 8, 16):
        def kernel(m_hbm, out_hbm, D, sem, *, reps):
            ld = pltpu.make_async_copy(m_hbm, D, sem)
            ld.start()
            ld.wait()
            for _ in range(reps):
                L, W = pk._factor_block_twolevel(D[:])
                # data dependency so applications cannot be elided
                D[:] = D[:] + 1e-20 * (L + W)
            st = pltpu.make_async_copy(D, out_hbm, sem)
            st.start()
            st.wait()

        @functools.partial(jax.jit, static_argnums=(0,))
        def run_mosaic(k, M, BSd=BSd):
            def body(_, M):
                out = pl.pallas_call(
                    functools.partial(kernel, reps=args.reps),
                    grid=(1,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=pl.BlockSpec(memory_space=pl.ANY),
                    out_shape=jax.ShapeDtypeStruct((BSd, 128, 128),
                                                   jnp.float32),
                    scratch_shapes=[
                        pltpu.VMEM((BSd, 128, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                    ],
                    interpret=jax.default_backend() != "tpu",
                )(M)
                return M + 1e-20 * out
            return jax.lax.fori_loop(0, k, body, M)

        M = jnp.asarray(spd(BSd))
        per = bench(run_mosaic, (M,)) / args.reps
        print(f"mosaic BSd={BSd}: {per * 1e6:.1f} us per chain application "
              f"(-> {per * 8 * (256 // BSd) * 1e3:.2f} ms per B=256 factor)",
              flush=True)

    # --- XLA-level chain at full batch ------------------------------------
    for B in (128, 256):
        @functools.partial(jax.jit, static_argnums=(0,))
        def run_xla(k, M):
            def body(_, M):
                out = M
                for _ in range(args.reps):
                    L, W = pk._factor_block_twolevel(out, mosaic=False)
                    out = out + 1e-20 * (L + W)
                return out
            return jax.lax.fori_loop(0, k, body, M)

        M = jnp.asarray(spd(B))
        per = bench(run_xla, (M,)) / args.reps
        print(f"xla B={B}: {per * 1e3:.3f} ms per chain application "
              f"(-> {per * 8 * 1e3:.2f} ms per factor, any chunking)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
