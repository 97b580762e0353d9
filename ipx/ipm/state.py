"""IPM iterate state as a fixed-shape JAX pytree (SURVEY.md component N5).

Everything the ``lax.while_loop`` carries: the primal-dual iterate, current
convergence scalars (computed by the previous step so the loop condition is a
pure scalar read), best-iterate tracking (f32 robustness: the final iterations
can degrade, so the reported solution is the best point visited), the
iteration counter/status, and a bounded on-device trace buffer (SURVEY.md
§5.5 — the TPU-native replacement for the reference's per-iteration prints,
reference component R14).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

TRACE_COLS = 8  # [mu, rp_rel, rd_rel, rel_gap, alpha_p, alpha_d, sigma, pobj]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class IPMState:
    x: jax.Array            # (n,) primal iterate, > 0
    y: jax.Array            # (m,) dual iterate
    s: jax.Array            # (n,) dual slacks, > 0
    it: jax.Array           # () int32 iteration counter
    status: jax.Array       # () int32 Status code
    mu: jax.Array           # () duality measure x@s/n
    mu0: jax.Array          # () initial duality measure (for the mu floor)
    rp_rel: jax.Array       # () relative primal infeasibility (inf-norm)
    rd_rel: jax.Array       # () relative dual infeasibility (inf-norm)
    rel_gap: jax.Array      # () relative complementarity gap x@s/(1+|c@x|)
    best_x: jax.Array       # best-merit iterate seen so far
    best_y: jax.Array
    best_s: jax.Array
    best_merit: jax.Array   # () max(rel_gap, rp_rel, rd_rel) at best iterate
    reg_boost: jax.Array    # () regularization escalation factor (>= 1);
                            # raised after a non-finite step, see mehrotra.py
    reg_floor: jax.Array    # () decay floor for reg_boost: 10x the highest
                            # boost that ever FAILED (1 if never failed) —
                            # boosts decay back down after success but not
                            # below the level this problem has shown it needs
    trace: jax.Array        # (max_iter, TRACE_COLS)
    rp: jax.Array           # (m,) primal residual A x - b at the iterate —
                            # carried so the step's entry does not re-stream
                            # A to recompute what the previous exit already
                            # measured (one A stream per iteration saved).
                            # Refreshed from the iterate at run entry
                            # (mehrotra.refresh_residuals), so checkpoints
                            # and warm starts never need to store it.
    rd: jax.Array           # (n,) dual residual A^T y + s - c (same deal)


def init_state(x, y, s, mu0, max_iter: int) -> IPMState:
    dtype = x.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    return IPMState(
        x=x, y=y, s=s,
        it=jnp.zeros((), jnp.int32),
        status=jnp.zeros((), jnp.int32),
        mu=inf, mu0=jnp.asarray(mu0, dtype),
        rp_rel=inf, rd_rel=inf, rel_gap=inf,
        best_x=x, best_y=y, best_s=s, best_merit=inf,
        reg_boost=jnp.ones((), dtype),
        reg_floor=jnp.ones((), dtype),
        trace=jnp.zeros((max_iter, TRACE_COLS), dtype),
        # placeholders: refresh_residuals fills these before any step runs
        rp=jnp.zeros_like(y), rd=jnp.zeros_like(x),
    )
