"""Precision-controlled linear algebra helpers.

On TPU the MXU natively multiplies in bf16; ``precision=HIGHEST`` requests
the 6-pass f32-accurate decomposition.  Accuracy-critical products (residuals,
iterative-refinement matvecs) must use HIGHEST for the f32 IPM to reach the
1e-6 relative gap target (SURVEY.md §7 hard part 1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


_PRECISIONS = {
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
    "default": lax.Precision.DEFAULT,
}


def precision_of(name: str):
    return _PRECISIONS[name]


def mm(a, b, precision: str = "highest"):
    """Matrix @ matrix with explicit precision."""
    return jnp.matmul(a, b, precision=_PRECISIONS[precision])


def mv(a, x, precision: str = "highest"):
    """Matrix @ vector with explicit precision."""
    return jnp.matmul(a, x, precision=_PRECISIONS[precision])


def vdot(x, y, precision: str = "highest"):
    return jnp.vdot(x, y, precision=_PRECISIONS[precision])


def inf_norm(v):
    return jnp.max(jnp.abs(v)) if v.size else jnp.zeros((), v.dtype)


def dtype_of(name: str):
    return {"float32": jnp.float32, "float64": jnp.float64,
            "bfloat16": jnp.bfloat16}[name]
