"""Batch-of-LPs parallelism (SURVEY.md component N12; BASELINE.json config 3).

The reference solves one LP at a time in a Python loop (SURVEY.md §3.1).  The
TPU-native design instead vmaps the whole Mehrotra step over a leading batch
axis and runs ONE ``lax.while_loop`` for the entire batch: every instance
advances in lock-step, instances that have converged/failed are frozen by
``step_masked``'s state-select, and the loop exits when no instance is still
RUNNING.  This turns B independent m x m Cholesky factorizations and
(m, n) x (n, m) assemblies into single batched XLA ops that tile cleanly onto
the MXU — the whole point of batching on TPU.

Data layout: a "batched LP" is an :class:`ipx.problem.lp.LP` whose leaves
carry a leading batch dimension (c: (B, n), A: (B, m, n), b: (B, m)).  All
instances in a batch share (m, n) — heterogeneous sizes are handled by the
problem layer's padding/bucketing, not here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ipx.options import SolverOptions
from ipx.problem.lp import LP
from ipx.ipm import mehrotra
from ipx.ipm.state import IPMState, init_state
from ipx.status import Status


def stack_lps(lps) -> LP:
    """Stack a sequence of same-shape LPs into one batched LP pytree."""
    if not lps:
        raise ValueError("empty LP batch")
    shapes = {(lp.m, lp.n) for lp in lps}
    if len(shapes) != 1:
        raise ValueError(f"batch mixes LP shapes: {sorted(shapes)}")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *lps)


def batch_starting_state(lp: LP, opts: SolverOptions):
    """vmap'd Mehrotra starting point -> (batched IPMState, batched AA^T
    factor).  The factor is loop-invariant and reused every iteration for
    the feasibility projection (see mehrotra.kkt_solve)."""

    def start(lp_i: LP):
        x0, y0, s0, fac = mehrotra.starting_point(lp_i, opts)
        mu0 = jnp.vdot(x0, s0) / lp_i.n
        st = init_state(x0, y0, s0, mu0, opts.max_iter)
        return mehrotra.refresh_residuals(lp_i, st, opts), fac

    return jax.vmap(start)(lp.with_a_storage(opts))


def run_batch(lp: LP, opts: SolverOptions,
              state0: IPMState | None = None) -> IPMState:
    """Solve a batch of LPs in one jitted while_loop.  Jit-compatible.

    The loop condition is ``any(instance still RUNNING)`` — converged
    instances are frozen (their state no longer changes) but still ride along
    until the slowest instance finishes (SURVEY.md §7 hard part 5; tail
    latency is a bucketing concern for the problem layer).

    ``state0`` resumes/warm-starts the whole batch (the batched augmented
    rescue path in ipx.api.solve_batch uses this).
    """
    lp = lp.with_a_storage(opts)
    start, fac_aat = batch_starting_state(lp, opts)
    if state0 is None:
        state0 = start
    else:
        # resumed / warm-started batches carry stale (or zero) residual
        # fields — refresh once outside the loop
        state0 = jax.vmap(
            lambda lp_i, st: mehrotra.refresh_residuals(lp_i, st, opts)
        )(lp, state0)
    step = jax.vmap(
        lambda lp_i, st, f: mehrotra.step_masked(lp_i, st, opts, f))

    def cond(st: IPMState):
        running = st.status == jnp.int32(Status.RUNNING)
        return jnp.any(running & (st.it < opts.max_iter))

    if opts.refactor_period == 1:
        def body(st: IPMState):
            return step(lp, st, fac_aat)
    else:
        # factor ONCE per body; trailing steps reuse it as a stale
        # preconditioner (SolverOptions.refactor_period)
        from ipx.linsys import normal_eq as _ne
        stale = opts.replace(refine_steps=opts.stale_solve_cg)
        step_fresh = jax.vmap(
            lambda lp_i, st, f, fc: mehrotra.step_masked(
                lp_i, st, opts, f, fc))
        step_stale = jax.vmap(
            lambda lp_i, st, f, fc, b0: mehrotra.step_masked_stale(
                lp_i, st, stale, f, fc, b0))

        def body(st: IPMState):
            # boost0 is the per-instance reg level the block's factor was
            # built with; step_masked_stale freezes a lane's trailing stale
            # steps after an in-block failure (ADVICE r4, medium).
            boost0 = st.reg_boost
            fac = jax.vmap(
                lambda a, d, rb: _ne.factor(a, d, opts, reg_scale=rb))(
                lp.A, st.x / st.s, st.reg_boost)
            st = step_fresh(lp, st, fac_aat, fac)
            for _ in range(opts.refactor_period - 1):
                st = step_stale(lp, st, fac_aat, fac, boost0)
            return st

    final = lax.while_loop(cond, body, state0)
    return jax.vmap(lambda st: mehrotra.finalize_status(st, opts))(final)


def run_batch_fixed_iters(lp: LP, state: IPMState, num_iters: int,
                          opts: SolverOptions, fac_aat=None) -> IPMState:
    """Advance the whole batch exactly ``num_iters`` steps (no masking).

    Benchmark harness path: a ``fori_loop`` of un-masked vmap'd steps
    measures the steady-state cost of one batched Mehrotra iteration —
    assembly + factorization + 2 solves + reductions — without convergence
    control flow.  Used by bench.py for the iterations/s/chip metric.
    """
    lp = lp.with_a_storage(opts)
    if fac_aat is None:
        step = jax.vmap(
            lambda lp_i, st: mehrotra.mehrotra_step(lp_i, st, opts))
        return lax.fori_loop(0, num_iters, lambda _, st: step(lp, st), state)
    if opts.refactor_period == 1:
        step = jax.vmap(
            lambda lp_i, st, f: mehrotra.mehrotra_step(lp_i, st, opts, f))
        return lax.fori_loop(0, num_iters,
                             lambda _, st: step(lp, st, fac_aat), state)
    # refactor_period > 1: one factor per `period` steps (the benchmarked
    # unit is then `period` IPM iterations per fori body)
    from ipx.linsys import normal_eq as _ne
    assert num_iters % opts.refactor_period == 0, (
        "fixed-iteration count must be a multiple of refactor_period")
    stale = opts.replace(refine_steps=opts.stale_solve_cg)
    step_fresh = jax.vmap(
        lambda lp_i, st, f, fc: mehrotra.mehrotra_step(lp_i, st, opts, f, fc))
    def _stale_step(lp_i, st, f, fc, b0):
        # boost-only guard (the bench path deliberately ignores status and
        # the iteration cap): a lane whose step went non-finite under this
        # block's factor would re-fail identically on the remaining stale
        # steps and multiply reg_boost without testing it (ADVICE r4)
        new = mehrotra.mehrotra_step(lp_i, st, stale, f, fc)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(st.reg_boost <= b0, a, b), new, st)

    step_stale = jax.vmap(_stale_step)

    def body(_, st):
        boost0 = st.reg_boost
        fac = jax.vmap(
            lambda a, d, rb: _ne.factor(a, d, opts, reg_scale=rb))(
            lp.A, st.x / st.s, st.reg_boost)
        st = step_fresh(lp, st, fac_aat, fac)
        for _k in range(opts.refactor_period - 1):
            st = step_stale(lp, st, fac_aat, fac, boost0)
        return st

    return lax.fori_loop(0, num_iters // opts.refactor_period, body, state)
