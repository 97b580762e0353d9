"""Mosaic legality probe: batched dot_general contracting the SUBLANE dim.

The LT-only pair-solve's forward sweep needs  upd = S^T y  with
S (BC, NB, m') stripes and y (BC, NB).  Two candidate forms:

  A) dot_general contracting lhs dim 1 (sublane) vs rhs dim 1 with a
     vector rhs — REJECTED by Mosaic on real TPU ("contracting dim of
     lhs/rhs must be the last dim and rhs must be vector-like").
  B) the same product as a batched row-vector @ matrix matmul,
     y[:, None, :] @ S — lhs contracting dim IS last, rhs non-contracting
     dim is a suffix; this is the shape Mosaic's batched-matmul path
     accepts.

Run:  python benchmarks/probe_dim1_dot.py            (real chip)
      python benchmarks/probe_dim1_dot.py --platform cpu   (interpret)
"""
from __future__ import annotations

import argparse
import functools
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--form", choices=["a", "b"], default="b")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != "tpu"
    BC, NB, MP = 8, 128, 896

    def kernel_a(s_ref, y_ref, o_ref):
        S = s_ref[:]                     # (BC, NB, MP)
        y = y_ref[:]                     # (BC, NB)
        # contract lhs dim 1 (sublane) with rhs dim 1, batch dim 0
        o_ref[:] = jax.lax.dot_general(
            S, y, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def kernel_b(s_ref, y_ref, o_ref):
        S = s_ref[:]                     # (BC, NB, MP)
        y = y_ref[:]                     # (BC, NB)
        # batched (1, NB) @ (NB, MP): lhs contracting dim last,
        # rhs non-contracting dims a suffix
        r = jax.lax.dot_general(
            y[:, None, :], S, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        o_ref[:] = r[:, 0, :]

    kernel = kernel_a if args.form == "a" else kernel_b

    @functools.partial(jax.jit, static_argnames=())
    def run(S, y):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BC, MP), jnp.float32),
            interpret=interpret,
        )(S, y)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    S = jax.random.normal(k1, (BC, NB, MP), jnp.float32)
    y = jax.random.normal(k2, (BC, NB), jnp.float32)
    got = np.asarray(run(S, y))
    want = np.einsum("bkm,bk->bm", np.asarray(S), np.asarray(y))
    err = np.abs(got - want).max() / np.abs(want).max()
    print(f"form={args.form} backend={jax.default_backend()} "
          f"interpret={interpret} rel_err={err:.2e}")
    assert err < 1e-5, err
    print("DIM1-CONTRACTION OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
