"""Probe: dot orientation in the symmetric assembly kernel (NT vs NN).

The production `_assemble_sym_kernel` contracts dim 1 x dim 1 (an A @ B^T
form) for every 128x128 output tile; the only other MXU dots in the kernel
library go through `_bmm`'s native (K on lhs-last / rhs-first) orientation.
Hypothesis: Mosaic pays a per-tile relayout for the NT form, which would
explain the measured 27.3ms against a ~9.4ms 3-pass MXU floor at
B=256, m=1024, n=2048 (profile_iter.jsonl).

Variant NN keeps the identical split3 algebra but feeds the kernel BOTH
A (row stripes, streamed+double-buffered for the W build) and At = A^T
(whole-instance resident, giving every tile dot the native (1,)x(0,)
orientation).  At is loop-invariant per solve, so if NN wins the library
can thread it through factor() at one extra transpose per solve.

Usage (real chip, serialized with other tunnel jobs):
    python benchmarks/probe_assemble_nn.py            # B=256 contract shape
    python benchmarks/probe_assemble_nn.py --quick    # interpret-mode check
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ipx.kernels.cholesky import NB, _assemble_sym_impl, _interpret


def _assemble_nn_kernel(a_hbm, at_hbm, d2_hbm, m_hbm, Atb, d2b, Mb,
                        S0, S1, h1, h2, h3, sems, *, m: int, n: int,
                        passes: int = 3):
    i = pl.program_id(0)
    ld_at = pltpu.make_async_copy(at_hbm.at[i], Atb, sems.at[0])
    ld_d = pltpu.make_async_copy(d2_hbm.at[i], d2b, sems.at[1])
    ld_at.start()
    ld_d.start()
    nb = m // NB
    hs = (h1, h2, h3)[:passes]
    Sb = (S0, S1)
    cps = {}

    def start_a(bi):
        cp = pltpu.make_async_copy(
            a_hbm.at[i, bi * NB:(bi + 1) * NB, :], Sb[bi % 2],
            sems.at[2 + bi % 2])
        cp.start()
        cps[bi] = cp

    start_a(0)
    ld_at.wait()
    ld_d.wait()
    for bi in range(nb):
        if bi + 1 < nb:
            start_a(bi + 1)
        cps.pop(bi).wait()
        W = Sb[bi % 2][:].astype(jnp.float32) * d2b[:]
        for h in hs:
            t = W.astype(jnp.bfloat16)
            W = W - t.astype(jnp.float32)
            h[:] = t
        for bj in range(bi + 1):
            cols = Atb[:, bj * NB:(bj + 1) * NB]          # (n, NB)
            acc = None
            for h in hs:
                p = jax.lax.dot_general(h[:], cols, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
            if bi == bj:
                acc = 0.5 * (acc + acc.T)
                Mb[bi * NB:(bi + 1) * NB, bj * NB:(bj + 1) * NB] = acc
            else:
                Mb[bi * NB:(bi + 1) * NB, bj * NB:(bj + 1) * NB] = acc
                Mb[bj * NB:(bj + 1) * NB, bi * NB:(bi + 1) * NB] = acc.T
    st = pltpu.make_async_copy(Mb, m_hbm.at[i], sems.at[0])
    st.start()
    st.wait()


def _assemble_nn_inkernel_kernel(a_hbm, d2_hbm, m_hbm, Ab, Atb, d2b, Mb,
                                 h1, h2, h3, sems, *, m: int, n: int,
                                 passes: int = 3):
    """NN orientation with the A^T layout built IN KERNEL: one explicit
    (NB, n) -> (n, NB) transpose per column block (8 per instance) instead
    of the per-tile relayout the NT dot implies (36 per instance).  No At
    plumbing, HBM traffic unchanged vs the production NT kernel."""
    i = pl.program_id(0)
    ld_a = pltpu.make_async_copy(a_hbm.at[i], Ab, sems.at[0])
    ld_d = pltpu.make_async_copy(d2_hbm.at[i], d2b, sems.at[1])
    ld_a.start()
    ld_d.start()
    ld_a.wait()
    ld_d.wait()
    nb = m // NB
    hs = (h1, h2, h3)[:passes]
    for bj in range(nb):
        Atb[:, bj * NB:(bj + 1) * NB] = Ab[bj * NB:(bj + 1) * NB, :].T
    for bi in range(nb):
        W = Ab[bi * NB:(bi + 1) * NB, :].astype(jnp.float32) * d2b[:]
        for h in hs:
            t = W.astype(jnp.bfloat16)
            W = W - t.astype(jnp.float32)
            h[:] = t
        for bj in range(bi + 1):
            cols = Atb[:, bj * NB:(bj + 1) * NB]
            acc = None
            for h in hs:
                p = jax.lax.dot_general(h[:], cols, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
            if bi == bj:
                acc = 0.5 * (acc + acc.T)
                Mb[bi * NB:(bi + 1) * NB, bj * NB:(bj + 1) * NB] = acc
            else:
                Mb[bi * NB:(bi + 1) * NB, bj * NB:(bj + 1) * NB] = acc
                Mb[bj * NB:(bj + 1) * NB, bi * NB:(bi + 1) * NB] = acc.T
    st = pltpu.make_async_copy(Mb, m_hbm.at[i], sems.at[0])
    st.start()
    st.wait()


@functools.partial(jax.jit, static_argnames=("interpret", "passes"))
def assemble_nn_inkernel(A, d2, interpret: bool | None = None,
                         passes: int = 3):
    if interpret is None:
        interpret = _interpret()
    B, m, n = A.shape
    kernel = functools.partial(_assemble_nn_inkernel_kernel, m=m, n=n,
                               passes=passes)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, m, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m, n), jnp.bfloat16),         # Ab
            pltpu.VMEM((n, m), jnp.bfloat16),         # Atb (built in kernel)
            pltpu.VMEM((1, n), jnp.float32),          # d2b
            pltpu.VMEM((m, m), jnp.float32),          # Mb
            pltpu.VMEM((NB, n), jnp.bfloat16),        # h1
            pltpu.VMEM((NB, n), jnp.bfloat16),        # h2
            pltpu.VMEM((NB, n), jnp.bfloat16),        # h3
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(A, d2[:, None, :])


@functools.partial(jax.jit, static_argnames=("interpret", "passes"))
def assemble_nn(A, At, d2, interpret: bool | None = None, passes: int = 3):
    if interpret is None:
        interpret = _interpret()
    B, m, n = A.shape
    kernel = functools.partial(_assemble_nn_kernel, m=m, n=n, passes=passes)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, m, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, m), jnp.bfloat16),         # Atb: whole A^T resident
            pltpu.VMEM((1, n), jnp.float32),          # d2b
            pltpu.VMEM((m, m), jnp.float32),          # Mb
            pltpu.VMEM((NB, n), jnp.bfloat16),        # S0: A row stripe (even)
            pltpu.VMEM((NB, n), jnp.bfloat16),        # S1: A row stripe (odd)
            pltpu.VMEM((NB, n), jnp.bfloat16),        # h1
            pltpu.VMEM((NB, n), jnp.bfloat16),        # h2
            pltpu.VMEM((NB, n), jnp.bfloat16),        # h3
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(A, At, d2[:, None, :])


def timed(fn, *args, k1=3, k2=13):
    """Tunnel-honest timing: device->host sync, two trip counts."""
    out = fn(*args)
    float(np.asarray(out).ravel()[:8].sum())

    def loop(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        float(np.asarray(out).ravel()[:8].sum())
        return time.perf_counter() - t0

    t1, t2 = loop(k1), loop(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--quick", action="store_true",
                    help="interpret-mode correctness check on CPU")
    args = ap.parse_args()
    if args.quick:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.m, args.n = 2, 256, 512

    B, m, n = args.batch, args.m, args.n
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((B, m, n)), jnp.bfloat16)
    At = jnp.swapaxes(A, 1, 2)
    d2 = jnp.asarray(np.exp(rng.uniform(-3, 3, (B, n))), jnp.float32)

    # correctness first (both passes counts, vs f64 oracle on one instance)
    Mnt = _assemble_sym_impl(A, d2, passes=3)
    Mnn = assemble_nn(A, At, d2, passes=3)
    a64 = np.asarray(A[0], np.float64)
    ref = (a64 * np.asarray(d2[0], np.float64)) @ a64.T
    err_nt = float(np.abs(np.asarray(Mnt[0]) - ref).max() / np.abs(ref).max())
    err_nn = float(np.abs(np.asarray(Mnn[0]) - ref).max() / np.abs(ref).max())
    agree = float(np.abs(np.asarray(Mnt[0]) - np.asarray(Mnn[0])).max())
    print(f"rel err vs f64: NT={err_nt:.3e} NN={err_nn:.3e} "
          f"|NT-NN|max={agree:.3e}", flush=True)
    assert err_nn < 1e-6, "NN variant inaccurate"
    if args.quick:
        # in-kernel transpose variant: interpret-only check — on real
        # Mosaic its Ab+Atb+Mb residency is 17.3MB VMEM stack, over the
        # 16MB budget (measured compile OOM at B=256, m=1024, n=2048)
        Mik = assemble_nn_inkernel(A, d2, passes=3)
        agree_ik = float(np.abs(np.asarray(Mnt[0]) - np.asarray(Mik[0])).max())
        print(f"|NT-NNik|max={agree_ik:.3e}", flush=True)
        assert agree_ik == 0.0, "in-kernel NN variant disagrees"

    if args.quick:
        print("quick check OK")
        return

    rows = []
    for passes in (3, 2):
        t_nt = timed(functools.partial(_assemble_sym_impl, passes=passes),
                     A, d2)
        t_nn = timed(functools.partial(assemble_nn, passes=passes),
                     A, At, d2)
        t_nn_tr = timed(
            lambda A, d2, p=passes: assemble_nn(A, jnp.swapaxes(A, 1, 2),
                                                d2, passes=p), A, d2)
        rows.append({"passes": passes, "ms_nt": round(t_nt * 1e3, 3),
                     "ms_nn": round(t_nn * 1e3, 3),
                     "ms_nn_incl_transpose": round(t_nn_tr * 1e3, 3)})
        print(json.dumps(rows[-1]), flush=True)
    with open("/root/repo/benchmarks/probe_assemble_nn.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps({"batch": B, "m": m, "n": n, **r}) + "\n")


if __name__ == "__main__":
    main()
