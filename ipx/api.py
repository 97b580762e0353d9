"""Public API (SURVEY.md component N14): solve / solve_batch -> Solution."""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
import jax

from ipx.numerics import dtype_of
from ipx.options import SolverOptions, DEFAULT_OPTIONS
from ipx.problem.lp import LP, make_lp
from ipx.ipm import mehrotra
from ipx.ipm.state import IPMState
from ipx.status import Status, STATUS_NAMES


@dataclass
class Solution:
    """Host-side solve result (original problem units).

    For :func:`solve_general` / :func:`solve_mps`: ``y`` holds the duals of
    the original rows, equality duals first then inequality duals
    (``m_eq + m_ub`` entries, scipy sign convention: <=-row marginals are
    <= 0 at optimality of a minimize problem); ``s = c - A_eq^T y_eq -
    A_ub^T y_ub`` are reduced costs over the original variables; for
    maximize problems all duals are reported in maximize sense.
    """

    x: np.ndarray
    y: np.ndarray
    s: np.ndarray
    objective: float
    dual_objective: float
    status: int
    iterations: int
    rel_gap: float
    rp_rel: float
    rd_rel: float
    trace: np.ndarray   # (max_iter, 8): mu, rp, rd, gap, a_p, a_d, sigma, pobj

    @property
    def status_name(self) -> str:
        return STATUS_NAMES.get(self.status, str(self.status))

    @property
    def optimal(self) -> bool:
        return self.status == int(Status.OPTIMAL)

    def iteration_table(self) -> str:
        """Classic IPM iteration log rendered from the on-device trace
        (reference component R14 equivalent; SURVEY.md §5.5)."""
        lines = ["iter        mu     rp_rel     rd_rel    rel_gap  alpha_p  alpha_d    sigma"]
        # rescued solves report CUMULATIVE iterations across ladder rungs;
        # the trace holds only the final rung's rows, so stop at the last
        # WRITTEN row (a written row always has mu > 0) instead of printing
        # zero-filled rows up to the cumulative count (ADVICE r4)
        for i in range(min(self.iterations, len(self.trace))):
            mu, rp, rd, gap, ap, ad, sg, _ = self.trace[i]
            if mu == 0.0 and rp == 0.0 and gap == 0.0:
                break
            lines.append(f"{i:4d}  {mu:9.2e}  {rp:9.2e}  {rd:9.2e}  "
                         f"{gap:9.2e}  {ap:7.4f}  {ad:7.4f}  {sg:7.4f}")
        return "\n".join(lines)


@partial(jax.jit, static_argnums=(1,))
def _run_single(lp: LP, opts: SolverOptions) -> IPMState:
    return mehrotra.run_single(lp, opts)


@partial(jax.jit, static_argnums=(1,))
def _run_single_resumed(lp: LP, opts: SolverOptions,
                        state0: IPMState) -> IPMState:
    return mehrotra.run_single(lp, opts, state0)


@partial(jax.jit, static_argnums=(1,))
def _run_batch(lp: LP, opts: SolverOptions) -> IPMState:
    from ipx.ipm import batched
    return batched.run_batch(lp, opts)


@partial(jax.jit, static_argnums=(1,))
def _run_batch_resumed(lp: LP, opts: SolverOptions,
                       state0: IPMState) -> IPMState:
    from ipx.ipm import batched
    return batched.run_batch(lp, opts, state0)


def _state_to_solution(lp: LP, st, obj_offset: float = 0.0) -> Solution:
    # Report the best-merit iterate visited (equals the final iterate on a
    # clean OPTIMAL exit; shields MAX_ITER/STALLED/FAILED exits from late
    # f32 degradation).  Solution-quality metrics are recomputed host-side
    # in f64 from the reported point — honest reporting, free of the device's
    # f32 measurement noise.
    x = np.asarray(st.best_x, np.float64)
    y = np.asarray(st.best_y, np.float64)
    s = np.asarray(st.best_s, np.float64)
    c = np.asarray(lp.c, np.float64)
    A = np.asarray(lp.A, np.float64)
    b = np.asarray(lp.b, np.float64)
    off = float(np.asarray(lp.obj_offset)) + obj_offset
    pobj = float(c @ x)
    rp_rel = float(np.abs(A @ x - b).max(initial=0.0) / (1 + np.abs(b).max(initial=0.0)))
    rd_rel = float(np.abs(A.T @ y + s - c).max(initial=0.0) / (1 + np.abs(c).max(initial=0.0)))
    rel_gap = float((x @ s) / (1 + abs(pobj)))
    return Solution(
        x=x, y=y, s=s,
        objective=pobj + off,
        dual_objective=float(b @ y) + off,
        status=int(st.status),
        iterations=int(st.it),
        rel_gap=rel_gap,
        rp_rel=rp_rel,
        rd_rel=rd_rel,
        trace=np.asarray(st.trace, np.float64),
    )


def solve(c, A=None, b=None, options: Optional[SolverOptions] = None,
          resume_from: Optional[str] = None,
          checkpoint_to: Optional[str] = None,
          presolve: bool = True,
          warm_start=None) -> Solution:
    """Solve one standard-form LP ``min c@x s.t. A@x=b, x>=0`` on device.

    Accepts either ``solve(lp_obj)`` with an :class:`LP` or
    ``solve(c, A, b)`` with array-likes.

    ``presolve=True`` (the default, like scipy.optimize.linprog) routes
    through the host-side presolve (reductions, dependent-row elimination,
    Ruiz equilibration) and postsolves back — raw real-world data needs the
    equilibration to reach 1e-6 in f32.  ``presolve=False`` keeps the pure
    device path for already-clean inputs (no host-side O(m^2 n) work).
    ``resume_from`` / ``checkpoint_to`` / ``warm_start`` always use the
    device path (their state lives in solver units).

    ``resume_from`` warm-starts from an ``ipx.obs.save_state`` snapshot;
    ``checkpoint_to`` writes the final state there (chunked solving: cap
    ``max_iter``, checkpoint, resume — SURVEY.md §5.3/§5.4).

    ``warm_start=(x, y, s)`` seeds from a previous RELATED solution
    (parametric LP families): the point is re-centered off the bounds
    before iterating (mehrotra.warm_start_state).
    """
    from ipx import obs

    opts = options or DEFAULT_OPTIONS
    if (presolve and resume_from is None and checkpoint_to is None
            and warm_start is None):
        return _solve_presolved(c, A, b, opts)
    if isinstance(c, LP):
        lp = c
    else:
        lp = make_lp(c, A, b)
    lp = lp.astype(dtype_of(opts.dtype))
    if resume_from is not None:
        state0 = obs.resume_state(obs.load_state(resume_from), opts.max_iter)
        st = _run_single_resumed(lp, opts, state0)
    elif warm_start is not None:
        xw, yw, sw = warm_start
        state0 = mehrotra.warm_start_state(lp, xw, yw, sw, opts)
        st = _run_single_resumed(lp, opts, state0)
    else:
        st = _run_single(lp, opts)
        st = _maybe_augmented_fallback(lp, st, opts)
    if checkpoint_to is not None:
        obs.save_state(checkpoint_to, st)
    return _state_to_solution(lp, st)


def _maybe_augmented_fallback(lp: LP, st, opts: SolverOptions):
    """Retry a STALLED dense-route solve with the augmented system.

    Stalls on the dense route are almost always the degenerate sqrt(eps)
    conditioning floor (see ipx/linsys/augmented.py); the augmented KKT
    system doesn't square the conditioning and routinely finishes the job.
    Warm-started from the stalled best iterate.  Disable with
    ``SolverOptions(augmented_fallback=False)``.
    """
    from ipx.status import Status as St

    if not opts.augmented_fallback or opts.linsys != "dense":
        return st
    # Only genuine numerical breakdowns — a far-from-converged MAX_ITER
    # exit is the user's iteration budget and must be respected.
    # NUMERICAL_FAILURE (NaN/non-finite factorization, typically badly
    # scaled f32 data) is rescued the same way as STALLED: the augmented
    # system does not square the conditioning.  A NEAR-MISS MAX_ITER —
    # rel_gap within the endgame-patience guard band (stall_gap_guard *
    # tol) — is rescued too: with the r5 patience guard these lanes used
    # to exit STALLED mid-crawl (and were rescued); the budget was spent
    # crawling at ratio-test-noise-collapsed steps and the ladder is the
    # designed second stage for exactly that wedge.
    near_miss_cap = (
        int(st.status) == int(St.MAX_ITER)
        and opts.stall_gap_guard > 0
        and float(st.rel_gap) <= opts.stall_gap_guard * opts.tol)
    if (int(st.status) not in (int(St.STALLED), int(St.NUMERICAL_FAILURE))
            and not near_miss_cap):
        return st
    # refactor_period is a dense-route-only lever; rescue rungs switch
    # linsys, so reset it (otherwise the replace() raises mid-rescue)
    aug = opts.replace(linsys="augmented", refactor_period=1)
    state0 = mehrotra.warm_start_state(lp, st.best_x, st.best_y, st.best_s,
                                       aug)
    import dataclasses as _dc
    st2 = _run_single_resumed(lp, aug, state0)
    # cumulative iterations across EVERY rung actually executed — including
    # failed intermediate rungs, whose work was still spent (ADVICE r4)
    it_spent = int(st.it) + int(st2.it)
    if int(st2.status) == int(St.OPTIMAL):
        return _dc.replace(st2, it=np.int32(it_spent))
    # The warm seed can itself be too decentered (it came from a stalled
    # run); a cold augmented solve is the reliable second stage.
    st3 = _run_single(lp, aug)
    it_spent += int(st3.it)
    if int(st3.status) == int(St.OPTIMAL):
        return _dc.replace(st3, it=np.int32(it_spent))
    # Final rung: the Schur-form quasi-definite route (capped scaling +
    # refinement against the true augmented operator) warm-started from the
    # stalled best iterate — the same rescue solve_batch uses in-batch.
    # Measured on the fuzz battery's knife-edge case (50x55 degenerate,
    # spread 1.5, seed 3): augmented LU stalls at 2.9e-6 while this rung
    # converges to 1.5e-7 with margin.
    asch = opts.replace(linsys="augmented_schur", refactor_period=1)
    st4 = _run_single_resumed(
        lp, asch, mehrotra.warm_start_state(lp, st.best_x, st.best_y,
                                            st.best_s, asch))
    it_spent += int(st4.it)
    if int(st4.status) == int(St.OPTIMAL):
        return _dc.replace(st4, it=np.int32(it_spent))
    return st


def _primal_polish(A, b, x, s, c=None, y=None, support_mask=None,
                   max_m: int = 8192):
    """Host-side f64 primal polish (crossover-lite, SURVEY.md §7 hard
    part 1).

    The f32 IPM's primal residual floors near eps*sqrt(n)*|x|; on
    DEGENERATE instances with spread-out Ruiz scales the postsolved
    objective error is ~|y| * ||Ax-b||, which can sit 2-4x above the fuzz
    battery's tolerance even when the rel-gap contract is met.  One f64
    least-squares correction restricted to the estimated support
    S = {x > s} (the complementarity partition) removes it: solve
    A_S dx = b - A x, leaving off-support zeros untouched so no clipping
    fights the projection (measured on the knife-edge 50x55 degenerate
    instance: obj err 2.3e-5 -> 9.2e-7, rp 5.2e-4 -> 7.3e-7 absolute).

    Returns the polished x only when it strictly improves ||Ax-b||_inf,
    keeps x >= 0, and moves the duality/complementarity gap by at most a
    negligible amount: the polish changes x@s by exactly s_S @ dx_S, which
    is ~0 for a CORRECT support (s_S ~ 0 by complementarity) and material
    precisely when the support estimate is wrong (degenerate x_j ~ s_j) —
    the failure mode ADVICE r4 flagged.  (An earlier guard on
    |c@x - b@y| was rejected: that mismatch measures y's dual error, and a
    polish that fixes x can legitimately move it.)  ``support_mask``
    excludes columns (e.g. presolve-fixed variables) from the support
    regardless of x/s.  Otherwise the input x.  Skipped for m > max_m
    (host lstsq cost)."""
    if A.shape[0] > max_m:
        return x
    S = x > np.maximum(s, 0.0)
    if support_mask is not None:
        S = S & support_mask
    if not S.any():
        return x
    r = b - A @ x
    try:
        dxS, *_ = np.linalg.lstsq(A[:, S], r, rcond=None)
    except np.linalg.LinAlgError:
        return x
    xp = x.copy()
    xp[S] = xp[S] + dxS
    # tiny negatives from the correction are rounding; anything material
    # means the support estimate was wrong — reject
    if xp.min() < -1e-8 * (1.0 + float(np.abs(x).max())):
        return x
    xp = np.maximum(xp, 0.0)
    if not (np.abs(A @ xp - b).max(initial=0.0) < np.abs(r).max(initial=0.0)):
        return x
    # complementarity-change guard (see docstring): |s_S @ dx_S| is the
    # polish's exact x@s change; cap it at 1e-7 relative so an accepted
    # polish can never move the reported rel_gap materially against the
    # 1e-6 contract.  c/y only refine the normalization when available.
    gap_move = abs(float(s[S] @ dxS))
    denom = 1.0 + (abs(float(c @ x)) if c is not None else 0.0)
    if gap_move > 1e-7 * denom:
        return x
    return xp


def _solve_presolved(c, A, b, opts: SolverOptions) -> Solution:
    """Standard-form solve through presolve + postsolve (host reductions,
    dependent-row elimination, Ruiz scaling)."""
    from ipx.problem.presolve import presolve as _presolve
    from ipx.status import Status as St

    if isinstance(c, LP):
        lp_in = c
        c, A, b = (np.asarray(lp_in.c, np.float64),
                   np.asarray(lp_in.A, np.float64),
                   np.asarray(lp_in.b, np.float64))
    else:
        c = np.asarray(c, np.float64)
        A = np.asarray(A, np.float64)
        b = np.asarray(b, np.float64)
    # bf16 A-storage composes with scaling only if every scale factor is a
    # power of two (exact in binary FP); arbitrary Ruiz factors silently
    # round the scaled instance to bf16 and the reported rp_rel blows up
    # to ~1e-3 while the reduced solve honestly reports OPTIMAL (r4 fix)
    pres = _presolve(c, A, b, pow2_scales=(opts.a_storage == "bfloat16"))

    def _empty(status: int) -> Solution:
        x = np.zeros(A.shape[1])
        x[pres.fixed_mask] = pres.fixed_vals[pres.fixed_mask]
        obj = float(c @ x)
        return Solution(x=x, y=np.zeros(A.shape[0]), s=np.zeros(A.shape[1]),
                        objective=obj, dual_objective=obj, status=status,
                        iterations=0, rel_gap=np.inf, rp_rel=np.inf,
                        rd_rel=np.inf, trace=np.zeros((0, 8)))

    if pres.status == "infeasible":
        return _empty(int(St.PRIMAL_INFEASIBLE))
    if pres.status == "unbounded":
        return _empty(int(St.DUAL_INFEASIBLE))
    if pres.A.size == 0 or pres.A.shape[0] == 0:
        sol = _empty(int(St.OPTIMAL))
        sol.rel_gap = sol.rp_rel = sol.rd_rel = 0.0
        return sol

    lp = make_lp(pres.c, pres.A, pres.b).astype(dtype_of(opts.dtype))
    st = _run_single(lp, opts)
    st = _maybe_augmented_fallback(lp, st, opts)
    red = _state_to_solution(lp, st)
    x = pres.postsolve_x(red.x)
    y = pres.postsolve_y(red.y)
    s = c - A.T @ y
    if int(red.status) == int(St.OPTIMAL):
        x = _primal_polish(A, b, x, s, c=c, y=y,
                           support_mask=~pres.fixed_mask)
    pobj = float(c @ x)
    rp_rel = float(np.abs(A @ x - b).max(initial=0.0)
                   / (1 + np.abs(b).max(initial=0.0)))
    rd_rel = float(np.maximum(-s, 0).max(initial=0.0)
                   / (1 + np.abs(c).max(initial=0.0)))
    # rel_gap stays the REDUCED (Ruiz-scaled) problem's complementarity gap
    # — the solver's convergence metric.  Recomputing x@s in original units
    # can legitimately exceed tol on degenerate instances (unscaling
    # amplifies x_j s_j cross terms) even when the certified solve met the
    # contract; consistency of the reported metrics with the returned x is
    # instead enforced by _primal_polish's no-worse-|c@x - b@y| acceptance
    # guard (ADVICE r4).
    return Solution(
        x=x, y=y, s=s, objective=pobj, dual_objective=float(b @ y),
        status=red.status, iterations=red.iterations, rel_gap=red.rel_gap,
        rp_rel=rp_rel, rd_rel=rd_rel, trace=red.trace)


def solve_general(glp, options: Optional[SolverOptions] = None) -> Solution:
    """Solve a :class:`GeneralLP` (inequalities + bounds) end to end.

    Host pipeline (SURVEY.md §3.4): standard-form conversion -> presolve +
    Ruiz equilibration -> device IPM solve on the scaled reduced problem ->
    postsolve back to original variables/units.  This is the path BASELINE
    config 2 (Netlib-style suite) exercises.
    """
    from ipx.problem.lp import GeneralLP, to_standard_form
    from ipx.problem.presolve import presolve
    from ipx.status import Status as St

    opts = options or DEFAULT_OPTIONS
    if not isinstance(glp, GeneralLP):
        raise TypeError(f"solve_general expects GeneralLP, got {type(glp)}")

    c_s, A_s, b_s, _, post = to_standard_form(glp)
    pres = presolve(c_s, A_s, b_s,
                    pow2_scales=(opts.a_storage == "bfloat16"))
    off = float(getattr(glp, "obj_offset", 0.0))
    maximize = bool(getattr(glp, "maximize", False))

    def _empty_solution(status: int) -> Solution:
        z = np.zeros(post.n_std)
        z[pres.fixed_mask] = pres.fixed_vals[pres.fixed_mask]
        x = post.x_orig(z)
        obj = float(np.asarray(glp.c) @ x) + off
        if maximize:
            obj = -obj
        return Solution(
            x=x, y=np.zeros(glp.A_eq.shape[0] + glp.A_ub.shape[0]),
            s=np.zeros(glp.n), objective=obj, dual_objective=obj,
            status=status, iterations=0, rel_gap=np.inf, rp_rel=np.inf,
            rd_rel=np.inf, trace=np.zeros((0, 8)))

    if pres.status == "infeasible":
        return _empty_solution(int(St.PRIMAL_INFEASIBLE))
    if pres.status == "unbounded":
        return _empty_solution(int(St.DUAL_INFEASIBLE))

    if pres.A.size == 0 or pres.A.shape[0] == 0:
        # fully presolved: all variables fixed
        sol = _empty_solution(int(St.OPTIMAL))
        sol.rel_gap = 0.0
        sol.rp_rel = 0.0
        sol.rd_rel = 0.0
        return sol

    lp = make_lp(pres.c, pres.A, pres.b).astype(dtype_of(opts.dtype))
    st = _run_single(lp, opts)
    st = _maybe_augmented_fallback(lp, st, opts)
    red = _state_to_solution(lp, st)

    # postsolve: scaled-reduced z -> std-form z -> original x
    z = np.zeros(post.n_std)
    z[pres.fixed_mask] = pres.fixed_vals[pres.fixed_mask]
    z[pres.kept_cols] = pres.col_scale * red.x
    if int(red.status) == int(St.OPTIMAL):
        # f64 support-restricted primal polish on the std-form triple
        # (same as _solve_presolved; see _primal_polish)
        y_pol = pres.postsolve_y(red.y)
        s_std = c_s - A_s.T @ y_pol
        z = _primal_polish(np.asarray(A_s, np.float64),
                           np.asarray(b_s, np.float64), z, s_std,
                           c=np.asarray(c_s, np.float64), y=y_pol,
                           support_mask=~pres.fixed_mask)
    x = post.x_orig(z)

    # postsolve duals to ORIGINAL problem units (ADVICE r1): std-form rows
    # are [A_eq | A_ub | appended bound rows]; bound-row duals are dropped
    # from y (their contribution stays in the dual objective via b_s@y_std),
    # and reduced costs are recomputed against the original gradient.
    y_std = pres.postsolve_y(red.y)                 # (m_std,) unscaled
    m_eq = glp.A_eq.shape[0]
    m_ub = glp.A_ub.shape[0]
    y = y_std[:m_eq + m_ub].copy()
    s = glp.c - glp.A_eq.T @ y[:m_eq] - glp.A_ub.T @ y[m_eq:]
    obj = float(np.asarray(glp.c) @ x) + off
    # std form: min c_s@z + conv_offset, A_s z = b_s  =>  dual obj in
    # original (minimize) units is b_s@y + conv_offset (+ file constant)
    dual_obj = float(b_s @ y_std) + post.obj_offset + off
    if maximize:
        obj, dual_obj = -obj, -dual_obj
        y, s = -y, -s
    return Solution(
        x=x, y=y, s=s,
        objective=obj, dual_objective=dual_obj,
        status=red.status, iterations=red.iterations,
        rel_gap=red.rel_gap, rp_rel=red.rp_rel, rd_rel=red.rd_rel,
        trace=red.trace)


def solve_mps(path: str, options: Optional[SolverOptions] = None) -> Solution:
    """Read an MPS file and solve it (SURVEY.md §3.4 Netlib/MPS path)."""
    from ipx.problem.mps import read_mps
    return solve_general(read_mps(path), options)


def solve_large(c, A=None, b=None, mesh=None,
                options: Optional[SolverOptions] = None,
                exec_chunk_iters: int = 0) -> Solution:
    """Solve one LARGE standard-form LP with row-block sharded normal
    equations (BASELINE config 4: m=32k, n=64k scale).

    A's columns are sharded over the mesh's "row" axis; the normal matrix is
    assembled as distributed row panels (psum_scatter over ICI) and solved
    by block-Jacobi-preconditioned CG — M never exists on one chip.  See
    ipx/linsys/schur.py.

    f32 ENDGAME (VERDICT r2 item 2): when the sharded normal-equations run
    exits non-OPTIMAL (the m>=4k conditioning floor), the solve is retried
    once, warm-started from the best iterate, on ``linsys="sharded_schur"``
    — the quasi-definite augmented system reduced to a DISTRIBUTED m x m
    Cholesky (capped scaling bounds the conditioning; refinement against
    the true augmented operator removes the regularization) — the same
    two-stage rescue the dense route uses, composed with the sharded
    factor.  Disable with ``options.augmented_fallback=False`` or pick a
    route explicitly with ``options.linsys="sharded"/"sharded_schur"``.

    ``exec_chunk_iters > 0`` caps each DEVICE EXECUTION at that many IPM
    iterations and resumes (in process, via the checkpoint/resume
    machinery) until ``options.max_iter`` or convergence — the chunked
    execution mode for environments where a long single execution dies at
    the device/runtime level.  Measured necessity (r5, v5e via the axon
    tunnel): at m>=24576 every single-program execution past ~16-32
    iterations faults with "TPU device error" while the SAME program
    executes 16-iteration runs repeatedly without fault
    (benchmarks/probe_32k_wall.py pins the per-stage evidence); chunked
    executions carried m=24576 to the 1e-6 gap.  Numerically identical to
    one long run: the iterate is the complete algorithm state
    (SURVEY.md §5.3/§5.4), only the loop-invariant AA^T projection factor
    is recomputed per execution.
    """
    from ipx import mesh as meshlib
    from ipx.linsys import schur
    from ipx.ipm.mehrotra import warm_start_state

    opts = options or DEFAULT_OPTIONS
    if opts.linsys not in ("sharded", "sharded_schur"):
        opts = opts.replace(linsys="sharded")
    if isinstance(c, LP):
        lp = c
    else:
        lp = make_lp(c, A, b)
    if opts.a_storage == "bfloat16":
        # keep (or make) A bf16 WITHOUT an f32 round-trip: at m=32k an f32
        # A is 8.6GB and the astype below would materialize it on device
        import dataclasses as _dc
        lp = _dc.replace(
            lp.with_a_storage(opts),
            c=lp.c.astype(dtype_of(opts.dtype)),
            b=lp.b.astype(dtype_of(opts.dtype)),
            obj_offset=lp.obj_offset.astype(dtype_of(opts.dtype)))
    else:
        lp = lp.astype(dtype_of(opts.dtype))

    if mesh is None:
        mesh = meshlib.make_mesh(batch=1, row=len(jax.devices()))
    p = mesh.shape[meshlib.ROW_AXIS]
    if lp.n % p or lp.m % p:
        raise ValueError(
            f"sharded solve needs m ({lp.m}) and n ({lp.n}) divisible by "
            f"the row-shard count p={p}; pad the problem first")

    sh = meshlib.large_lp_sharding(mesh)
    lp = LP(c=jax.device_put(lp.c, sh["c"]),
            A=jax.device_put(lp.A, sh["A"]),
            b=jax.device_put(lp.b, sh["b"]),
            obj_offset=jax.device_put(lp.obj_offset, sh["obj_offset"]))
    from ipx.status import Status

    def _run_stage(o, chunk, state0=None):
        """One solve stage; chunk > 0 caps each device execution and
        resumes (both the normal-equations stage AND the rescue must be
        chunked — the m>=24k device fault hits any long execution)."""
        if chunk <= 0:
            st = (_run_single(lp, o) if state0 is None
                  else _run_single_resumed(lp, o, state0))
            jax.block_until_ready(st.x)
            return st
        from ipx import obs
        caps = list(range(chunk, o.max_iter + 1, chunk))
        if not caps or caps[-1] != o.max_iter:
            caps.append(o.max_iter)
        st = None
        for cap in caps:
            oc = o.replace(max_iter=cap)
            if st is None and state0 is None:
                st = _run_single(lp, oc)
            else:
                s0 = state0 if st is None else obs.resume_state(st, cap)
                st = _run_single_resumed(lp, oc, s0)
            jax.block_until_ready(st.x)
            if int(st.status) not in (int(Status.RUNNING),
                                      int(Status.MAX_ITER)):
                break
        return st

    with schur.use_mesh(mesh):
        st = _run_stage(opts, exec_chunk_iters)
        bad = int(st.status) in (int(Status.STALLED), int(Status.MAX_ITER),
                                 int(Status.NUMERICAL_FAILURE))
        if bad and opts.augmented_fallback and opts.linsys == "sharded":
            # sharded augmented-Schur endgame, warm-started from the best
            # iterate the normal-equations stage reached
            sch = opts.replace(linsys="sharded_schur")
            state0 = warm_start_state(lp, st.best_x, st.best_y, st.best_s,
                                      sch)
            st2 = _run_stage(sch, exec_chunk_iters, state0)
            if float(st2.best_merit) < float(st.best_merit):
                import dataclasses
                # report CUMULATIVE iterations across both stages
                st = dataclasses.replace(st2, it=st.it + st2.it)
    return _state_to_solution(lp, st)


def solve_many(problems, options: Optional[SolverOptions] = None,
               m_multiple: int = 32, n_multiple: int = 64) -> list:
    """Solve a MIXED-SIZE collection of standard-form LPs (SURVEY.md §2.2
    "EP" row; VERDICT r1 item 8).

    ``problems`` is a sequence of ``(c, A, b)`` triples or :class:`LP`
    objects of arbitrary (m, n).  Instances are grouped into geometric shape
    buckets (ipx/problem/batching.py), padded solution-invariantly, solved
    one device program per bucket via :func:`solve_batch`, unpadded, and
    returned as a list of :class:`Solution` in input order.  XLA compiles
    once per bucket — O(log(max/min)) programs for arbitrary workloads
    instead of one per shape.
    """
    from ipx.problem.batching import bucket_lps

    opts = options or DEFAULT_OPTIONS
    probs = []
    for p in problems:
        if isinstance(p, LP):
            probs.append((np.asarray(p.c, np.float64),
                          np.asarray(p.A, np.float64),
                          np.asarray(p.b, np.float64)))
        else:
            c, A, b = p
            probs.append((np.asarray(c, np.float64),
                          np.asarray(A, np.float64),
                          np.asarray(b, np.float64)))

    out: list = [None] * len(probs)
    for shape, items in sorted(bucket_lps(probs, m_multiple,
                                          n_multiple).items()):
        sols = solve_batch([it[1].lp for it in items], options=opts)
        for (idx, padded), sol in zip(items, sols):
            c, A, b = probs[idx]
            # strip padding and re-derive every reported quantity from the
            # ORIGINAL problem: the padded dead columns carry c_j = 1 and
            # x_j ~ mu, which must not leak into the objective
            x = padded.unpad_x(sol.x)
            y = padded.unpad_y(sol.y)
            s = sol.s[: padded.n_orig]
            pobj = float(c @ x)
            out[idx] = Solution(
                x=x, y=y, s=s,
                objective=pobj, dual_objective=float(b @ y),
                status=sol.status, iterations=sol.iterations,
                rel_gap=float(abs(x @ s) / (1 + abs(pobj))),
                rp_rel=float(np.abs(A @ x - b).max(initial=0.0)
                             / (1 + np.abs(b).max(initial=0.0))),
                rd_rel=float(np.abs(A.T @ y + s - c).max(initial=0.0)
                             / (1 + np.abs(c).max(initial=0.0))),
                trace=sol.trace)
    return out


def solve_batch(lps, options: Optional[SolverOptions] = None) -> list:
    """Solve a batch of same-shape LPs in one device program.

    ``lps`` is a sequence of :class:`LP` (or an already-stacked batched LP
    with leading batch dim).  Returns a list of :class:`Solution`, one per
    instance, in input order.  This is the TPU-native replacement for the
    reference's one-at-a-time Python loop (SURVEY.md component N12,
    BASELINE.json config 3).
    """
    from ipx.ipm import batched

    opts = options or DEFAULT_OPTIONS
    if isinstance(lps, LP):
        blp = lps
        if blp.A.ndim != 3:
            raise ValueError("batched LP must have A of rank 3 (B, m, n)")
    else:
        blp = batched.stack_lps(list(lps))
    blp = blp.astype(dtype_of(opts.dtype))
    st = _run_batch(blp, opts)

    batch = blp.A.shape[0]
    # ONE device->host transfer for the whole batch (VERDICT r1 weak #9:
    # per-member tree_map[i] used to issue O(B) separate fetches); members
    # are then sliced host-side.  Only genuinely broken members (STALLED /
    # NUMERICAL_FAILURE — typically a handful of degenerate instances) go
    # back to the device for the augmented rescue.
    st_h = jax.tree_util.tree_map(np.asarray, st)
    blp_h = jax.tree_util.tree_map(np.asarray, blp)
    rescue = (int(Status.STALLED), int(Status.NUMERICAL_FAILURE))

    # Batched ON-DEVICE rescue (VERDICT r1 item 6): broken members
    # (degenerate conditioning floor) are gathered into ONE sub-batch and
    # re-run through the vmap-safe Schur-form quasi-definite augmented
    # route (linsys="augmented_schur"), warm-started from their best
    # iterates — one device program instead of a host loop of single
    # solves.  Any member the batched pass does not bring to OPTIMAL falls
    # through to the per-member LU fallback below (the gold-standard
    # single-instance robustness mode).
    bad = [i for i in range(batch)
           if int(st_h.status[i]) in rescue]
    if bad and opts.augmented_fallback and opts.linsys == "dense":
        import jax.numpy as jnp
        from ipx.ipm import mehrotra, batched as batched_mod

        idx = np.asarray(bad)
        sub_lp = jax.tree_util.tree_map(
            lambda leaf: jnp.asarray(leaf[idx]), blp_h)
        aug = opts.replace(linsys="augmented_schur", refactor_period=1)
        state0 = jax.vmap(
            lambda lp_i, x, y, s: mehrotra.warm_start_state(
                lp_i, x, y, s, aug))(
            sub_lp, jnp.asarray(st_h.best_x[idx]),
            jnp.asarray(st_h.best_y[idx]), jnp.asarray(st_h.best_s[idx]))
        sub_st = jax.tree_util.tree_map(
            np.asarray, _run_batch_resumed(sub_lp, aug, state0))
        fixed = np.asarray(sub_st.status) == int(Status.OPTIMAL)
        if fixed.any():
            take = idx[fixed]
            # report CUMULATIVE iterations across both stages (same fix as
            # solve_large r4: a rescued member's `it` otherwise records
            # only the warm-started retry — the r4 cg0 bench probe showed
            # "median 2 iterations" for full solves, which is really
            # "stage-1 stall + 2 rescue steps")
            import dataclasses as _dc
            sub_st = _dc.replace(sub_st, it=sub_st.it + st_h.it[idx])

            def merge(a, b):
                a = a.copy()
                a[take] = b[fixed]
                return a

            st_h = jax.tree_util.tree_map(merge, st_h, sub_st)

    sols = []
    for i in range(batch):
        lp_i = jax.tree_util.tree_map(lambda leaf: leaf[i], blp_h)
        st_i = jax.tree_util.tree_map(lambda leaf: leaf[i], st_h)
        if (opts.augmented_fallback and opts.linsys == "dense"
                and int(st_i.status) in rescue):
            st_i = _maybe_augmented_fallback(lp_i, st_i, opts)
        sols.append(_state_to_solution(lp_i, st_i))
    return sols
