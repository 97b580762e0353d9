"""Stripe-width A/B for the fused A-resident matvec kernel (round 5).

The profile ledger has ``ata_apply`` at 2.31 ms/stream (B=256, m=1024,
n=2048, bf16 A) vs a 1.31 ms HBM floor (~57%).  ``stripe_width`` picks the
WIDEST stripe under a 2MB VMEM budget — at these shapes that is ns=1024,
i.e. only TWO grid steps per instance, which caps DMA/compute overlap at
~50%.  This probe times the kernel at several widths to find the actual
knee.  Timing per the repo rule: device->host scalar sync, two trip
counts, difference cancels dispatch.

Usage: python benchmarks/probe_ata_width.py [--batch 256] [--m 1024]
       [--n 2048] [--widths 256 512 1024 2048]
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--widths", type=int, nargs="+",
                    default=[256, 512, 1024, 2048])
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ipx.kernels import fused as fk

    B, m, n = args.batch, args.m, args.n
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    A = jax.random.normal(k1, (B, m, n), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(k2, (B, 1, m), jnp.float32)
    w = jax.random.normal(k3, (B, 1, n), jnp.float32)
    al = jnp.abs(jax.random.normal(k3, (B, 1, n), jnp.float32))
    zr = jnp.zeros((B, 1, n), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("ns", "k"))
    def chain(A, v, al, zr, w, ns, k):
        # k DEPENDENT applies so per-call dispatch amortizes and the device
        # cannot overlap successive streams
        vm = jax.vmap(lambda Ai, vi, ali, zi, wi:
                      fk._ata_apply_2d(Ai, vi, ali, zi, wi, ns))
        out = v
        for _ in range(k):
            y, t = vm(A, out, al, zr, w)
            out = y.reshape(B, 1, m)[:, :, :m]
        return out

    a_bytes = B * m * n * A.dtype.itemsize
    for ns in args.widths:
        if n % ns:
            continue
        k1_, k2_ = 4, 12
        r1 = chain(A, v, al, zr, w, ns, k1_)
        float(np.asarray(r1).sum())
        r2 = chain(A, v, al, zr, w, ns, k2_)
        float(np.asarray(r2).sum())

        def best(kk):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(chain(A, v, al, zr, w, ns, kk)).sum())
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t = max((best(k2_) - best(k1_)) / (k2_ - k1_), 1e-9)
        bw = a_bytes / t / 1e9
        print(json.dumps({"ns": ns, "ms_per_stream": round(t * 1e3, 3),
                          "achieved_GBps": round(bw, 1),
                          "pct_of_819": round(100 * bw / 819.0, 1)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
