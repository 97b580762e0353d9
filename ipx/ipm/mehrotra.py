"""Mehrotra predictor-corrector as a jit-compiled fixed-shape iteration.

TPU-native re-design of the reference's Python ``while`` loop (SURVEY.md
§3.1, reference components R3-R11): the whole solve is ONE XLA program — a
``lax.while_loop`` whose body is the predictor-corrector step.  Control
crosses host->device exactly once per solve.  All shapes are static; per-
instance convergence is a masked state freeze so the same step vmaps over
instance batches (BASELINE.json config 3).

Algorithm [evidence tier B — Mehrotra 1992; Nocedal & Wright ch. 14]:
  predictor:  solve with r_xs = X S e           -> affine direction
  centering:  sigma = (mu_aff / mu) ** 3
  corrector:  solve with r_xs = X S e + dX_a dS_a e - sigma mu e  (factor reused)
  step:       damped fraction-to-boundary ratio tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ipx.numerics import mv, inf_norm
from ipx.options import SolverOptions
from ipx.problem.lp import LP
from ipx.ipm.state import IPMState, init_state
from ipx.linsys import normal_eq
from ipx.status import Status


def max_step(v: jax.Array, dv: jax.Array) -> jax.Array:
    """Fraction-to-boundary ratio test: min over dv<0 of -v/dv (else +inf).

    Fused masked reduction (reference R9; BASELINE.json "step-length ratio
    tests ... as fused reductions") — XLA fuses the where+div+min into one
    pass; padded lanes must carry dv=0 so they report +inf (SURVEY.md §7
    hard part 3).
    """
    neg = dv < 0
    ratios = jnp.where(neg, -v / jnp.where(neg, dv, -jnp.ones_like(dv)),
                       jnp.inf)
    return jnp.min(ratios)


def starting_point(lp: LP, opts: SolverOptions):
    """Mehrotra least-squares starting point (reference R3), on device.

    Uses the same normal-equations machinery with D^2 = I, so the AA^T
    factorization reuses the (XLA or Pallas) Cholesky backend.  Returns the
    AA^T factor as well: it is loop-invariant and reused every iteration to
    project the search direction back onto A dx = -rp (f32 feasibility-drift
    control, SURVEY.md §7 hard part 1).
    """
    A, b, c = lp.A, lp.b, lp.c
    ones = jnp.ones_like(c)
    fac = normal_eq.factor(A, ones, opts)
    x = mv(A.T, normal_eq.solve(fac, A, b, opts), opts.matmul_precision)
    y = normal_eq.solve(fac, A, mv(A, c, opts.matmul_precision), opts)
    s = c - mv(A.T, y, opts.matmul_precision)

    zero = jnp.zeros((), x.dtype)
    dx = jnp.maximum(-1.5 * jnp.min(x), zero)
    ds = jnp.maximum(-1.5 * jnp.min(s), zero)
    x = x + dx
    s = s + ds
    xs = jnp.vdot(x, s)
    # Degenerate fallback (xs <= 0 can only happen for pathological data):
    bad = ~(xs > 0)
    x = jnp.where(bad, jnp.ones_like(x), x + 0.5 * xs / jnp.sum(s))
    s = jnp.where(bad, jnp.ones_like(s), s + 0.5 * xs / jnp.sum(x))
    return x, y, s, fac


def _scalars(lp: LP, x, y, s, prec: str, fused: bool = False):
    """Residual norms, duality measure, relative gap (reference R4).

    The gap criterion is the COMPLEMENTARITY gap x@s/(1+|c@x|), not the
    objective gap |c@x - b@y|: x@s is a sum of positives (no cancellation),
    so f32 can measure it down to eps*mu, whereas c@x - b@y has an absolute
    noise floor of ~eps*|c@x| ~ 1e-7 that would make a 1e-6 relative-gap
    certificate unreliable.  The two coincide to second order once
    rp, rd <= tol_feas.
    """
    n = lp.n
    if fused:
        # A@x and A^T y are an independent pair: one A stream
        from ipx.kernels import fused as fk
        ax, aty = fk.ata_apply(lp.A, y, None, x)
        rp = ax - lp.b
        rd = aty + s - lp.c
    else:
        rp = mv(lp.A, x, prec) - lp.b
        rd = mv(lp.A.T, y, prec) + s - lp.c
    mu = jnp.vdot(x, s) / n
    pobj = jnp.vdot(lp.c, x)
    one = jnp.ones((), x.dtype)
    rp_rel = inf_norm(rp) / (one + inf_norm(lp.b))
    rd_rel = inf_norm(rd) / (one + inf_norm(lp.c))
    rel_gap = (mu * n) / (one + jnp.abs(pobj))
    return rp, rd, mu, rp_rel, rd_rel, rel_gap, pobj


def refresh_residuals(lp: LP, state: IPMState, opts: SolverOptions
                      ) -> IPMState:
    """Fill the carried residual fields (rp, rd, mu) from the iterate.

    The step reads residuals from the state instead of re-streaming A at
    entry — the previous step's exit already measured them on the SAME
    iterate (bit-identical values, one A stream per iteration saved).
    Every run entry point calls this once outside the loop, so resumed
    checkpoints / warm starts / hand-built states need no stored
    residuals."""
    import dataclasses
    fuse = normal_eq.use_fused_matvec(opts, lp.A)
    rp, rd, mu, *_ = _scalars(lp, state.x, state.y, state.s,
                              opts.matmul_precision, fused=fuse)
    return dataclasses.replace(state, rp=rp, rd=rd, mu=mu)


def mehrotra_step(lp: LP, state: IPMState, opts: SolverOptions,
                  fac_aat=None, fac=None) -> IPMState:
    """One predictor-corrector iteration (pure; fixed shapes).

    ``fac_aat`` is the loop-invariant Cholesky factor of A A^T (from the
    starting point); when given, the corrector direction is projected back
    onto the null-space condition A dx = -rp, canceling the f32 feasibility
    drift that the ill-conditioned D^2 injects near convergence.

    ``fac`` injects a PRE-COMPUTED normal-equations factor (the
    ``refactor_period`` throughput lever — see SolverOptions): the step
    then skips its own factorization and solves with the given (possibly
    one-iteration-stale) factor as CG preconditioner.  ``fac.d2`` is
    replaced with THIS iterate's scaling, so the matrix-free Krylov
    operator and all KKT refinement residuals target the true current
    system; only the preconditioner lags.
    """
    A = lp.A
    x, y, s = state.x, state.y, state.s
    prec = opts.matmul_precision
    dtype = x.dtype
    n = lp.n
    fuse = normal_eq.use_fused_matvec(opts, A)

    # Residuals are CARRIED: the previous step's exit _scalars measured
    # them on this exact iterate (refresh_residuals seeds the first
    # iteration) — recomputing here would re-stream A for bit-identical
    # values.
    rp, rd, mu = state.rp, state.rd, state.mu
    mu_safe = jnp.maximum(mu, jnp.asarray(1e-30, dtype))

    # The feasibility projection is a NORMAL-EQUATIONS pathology fix; the
    # augmented system satisfies the primal row directly, and projecting
    # through the AA^T factor re-injects the squared-conditioning noise the
    # augmented route exists to avoid (measured: flips 3/4 degenerate
    # instances from OPTIMAL to STALLED).
    do_project = (opts.project_feasibility
                  and not opts.linsys.startswith("augmented")
                  and opts.linsys != "sharded_schur")

    # --- factor A D^2 A^T once, reuse for both solves (R5, R6) -------------
    # d2 is deliberately NOT range-clipped: huge x/s entries (effectively
    # fixed duals) are tamed by the Jacobi scaling inside factor(), and
    # clipping them makes those dual directions spuriously mobile, stalling
    # the ratio test.  f32 PSD loss near convergence is handled by the
    # cross-iteration regularization escalation below (state.reg_boost).
    d2 = x / s
    if fac is None:
        fac = normal_eq.factor(A, d2, opts, reg_scale=state.reg_boost)
    else:
        import dataclasses as _dc
        fac = _dc.replace(fac, d2=d2)

    # Options for the normal-eq solves INSIDE refinement sweeps: the sweep
    # rhs is an already-small KKT residual, so a cheaper solve (fewer CG
    # iterations; refine_solve_cg=0 is one direct pair-solve) perturbs the
    # correction only at second order.  -1 keeps the main solve's CG count.
    ref_opts = (opts if opts.refine_solve_cg < 0
                else opts.replace(refine_steps=opts.refine_solve_cg))

    def newton_direction(e_p, e_d, e_xs, sopts=opts):
        """Solve the Newton system  A dx = -e_p;  A^T dy + ds = -e_d;
        S dx + X ds = -e_xs  via the normal equations (or the augmented
        system when opts.linsys == "augmented" — no condition squaring,
        needed past the degenerate sqrt(eps) floor)."""
        if opts.linsys == "augmented":
            from ipx.linsys import augmented
            return augmented.solve_newton(fac, A, x, s, e_p, e_d, e_xs, opts)
        if opts.linsys in ("augmented_schur", "sharded_schur"):
            from ipx.linsys import augmented
            return augmented.solve_newton_schur(fac, A, x, s, e_p, e_d,
                                                e_xs, opts)
        if fuse:
            from ipx.kernels import fused as fk
            rhs = -e_p - fk.a_matvec(A, d2 * e_d - e_xs / s)
            dy = normal_eq.solve(fac, A, rhs, sopts)
            ds = -e_d - fk.at_matvec(A, dy)
        else:
            rhs = -e_p - mv(A, d2 * e_d - e_xs / s, prec)
            dy = normal_eq.solve(fac, A, rhs, sopts)
            ds = -e_d - mv(A.T, dy, prec)
        dx = -(e_xs / s) - d2 * ds
        return dx, dy, ds

    def kkt_solve(r_xs, refines, project):
        """Newton direction + full-KKT iterative refinement.

        The normal-equations route satisfies the complementarity row exactly
        but A dx = -rp only to f32 accuracy, and the error is amplified by
        D^2 ~ 1/mu near convergence (feasibility drift).  Refinement re-solves
        the SAME factored system with the measured KKT residuals as rhs, so
        the correction enters through D^2 A^T dy — scale-aware on the small
        coordinates — and both feasibility and centering stay accurate.
        """
        dx, dy, ds = newton_direction(rp, rd, r_xs)
        for _ in range(refines):
            e_p = rp + mv(A, dx, prec)
            e_d = rd + mv(A.T, dy, prec) + ds
            e_xs = r_xs + s * dx + x * ds
            ddx, ddy, dds = newton_direction(e_p, e_d, e_xs, sopts=ref_opts)
            dx, dy, ds = dx + ddx, dy + ddy, dds + ds
        if fac_aat is not None and project:
            # Project dx onto {A dx = -rp} with the loop-invariant AA^T
            # factor: the normal-equations route's feasibility error is
            # amplified by D^2 ~ 1/mu near convergence, but cond(AA^T) is
            # mu-independent, so this pins the primal row at fixed f32
            # accuracy for the whole run (the drift killer — SURVEY.md §7
            # hard part 1).  The complementarity row moves by S*(proj delta),
            # second-order small once e_p is small.
            e_p = rp + mv(A, dx, prec)
            proj_opts = opts.replace(refine_steps=opts.proj_cg_iters)
            dx = dx - mv(A.T, normal_eq.solve(fac_aat, A, e_p, proj_opts),
                         prec)
        return dx, dy, ds

    def kkt_solve_fused(r_xs, refines, project):
        """Stream-fused version of :func:`kkt_solve` (matvec_backend=
        "fused"): identical refinement algebra, but each sweep's THREE A
        streams (e_p, e_d, rhs) collapse into one ``ata_apply`` call, and
        the final sweep's ``ds`` update shares a stream with the
        projection's ``e_p`` (the forward product of the updated dx is the
        fused form ``A (dx + d2 (A^T ddy) + ...)``).  The cancellation-
        sensitive elementwise residuals (e_d, e_xs) are computed OUTSIDE
        the kernel in the same order as kkt_solve, so refinement quality is
        unchanged — only the A traffic drops (~2x fewer streams).
        """
        from ipx.kernels import fused as fk

        do_proj = fac_aat is not None and project
        rhs = -rp - fk.a_matvec(A, d2 * rd - r_xs / s)
        dy = normal_eq.solve(fac, A, rhs, opts)
        if refines == 0 and do_proj:
            # fold ds/dx construction with the projection's e_p stream:
            # y = A @ (d2 (A^T dy + rd) - r_xs/s) = A @ dx_new
            yv, t = fk.ata_apply(A, dy, d2, -(r_xs / s), beta=rd)
            ds = -rd - t
            dx = -(r_xs / s) - d2 * ds
            e_p = rp + yv
        else:
            ds = -rd - fk.at_matvec(A, dy)
            dx = -(r_xs / s) - d2 * ds
            for k in range(refines):
                last = k == refines - 1
                e_xs = r_xs + s * dx + x * ds
                # beta carries the cancellation-critical residual sum:
                # w = d2 * ((A^T dy) + (rd + ds)) + wn = d2 * e_d + wn,
                # with e_d's near-total cancellation done BEFORE the d2
                # scaling (see ipx/kernels/fused.py)
                beta = rd + ds
                yv, t = fk.ata_apply(A, dy, d2, dx - e_xs / s, beta=beta)
                # e_d MUST reproduce the kernel's association fl(t + beta)
                # bit-for-bit: the rhs the kernel built and the dds update
                # below must see the SAME rounded e_d, else the ~eps
                # discrepancy is amplified by d2 * dds (measured: 4e4x worse
                # complementarity residual with e_d = rd + t + ds)
                e_d = t + beta
                ddy = normal_eq.solve(fac, A, -rp - yv, ref_opts)
                if last and do_proj:
                    # one stream: A @ dx_new and A^T ddy together
                    # (w = d2 ((A^T ddy) + e_d) + dx - e_xs/s = A-arg of
                    # dx_new; e_d + t2 = -dds is the other cancelling pair)
                    y2, t2 = fk.ata_apply(A, ddy, d2, dx - e_xs / s,
                                          beta=e_d)
                    dds = -e_d - t2
                    e_p = rp + y2
                else:
                    dds = -e_d - fk.at_matvec(A, ddy)
                ddx = -(e_xs / s) - d2 * dds
                dx, dy, ds = dx + ddx, dy + ddy, ds + dds
        if do_proj:
            proj_opts = opts.replace(refine_steps=opts.proj_cg_iters)
            dx = dx - fk.at_matvec(
                A, normal_eq.solve(fac_aat, A, e_p, proj_opts))
        return dx, dy, ds

    if fuse:
        kkt_solve = kkt_solve_fused

    # --- predictor (R7) ------------------------------------------------------
    # Measured caution (m=1024/n=2048 scale): the affine direction's quality
    # propagates through sigma and the corrector's second-order term —
    # skipping its projection or dropping a refinement sweep stalls 3/6
    # random instances.  Lighter predictor treatment stays available via
    # predictor_refine_steps for small/easy problem classes only.
    dx_a, dy_a, ds_a = kkt_solve(x * s, opts.predictor_refine_steps,
                                 project=do_project)
    one = jnp.ones((), dtype)
    ap_a = jnp.minimum(one, max_step(x, dx_a))
    ad_a = jnp.minimum(one, max_step(s, ds_a))
    mu_aff = jnp.vdot(x + ap_a * dx_a, s + ad_a * ds_a) / n

    # --- centering (R8) ------------------------------------------------------
    ratio = jnp.clip(mu_aff / mu_safe, 0.0, 1.0)
    sigma = ratio ** jnp.asarray(opts.sigma_power, dtype)

    # --- corrector, factor reused (R10) --------------------------------------
    dx, dy, ds = kkt_solve(x * s + dx_a * ds_a - sigma * mu,
                           opts.kkt_refine_steps,
                           project=do_project)

    # --- Gondzio multiple centrality correctors (optional) -------------------
    # Each corrector reuses the factorization: push the trial point's
    # outlier complementarity products x_j s_j back toward the central path
    # [beta_min*mu, beta_max*mu], accept the corrected direction only where
    # it lengthens the step (per-instance select — vmap-safe).  Production
    # IPM feature absent from the reference class; typically saves 20-40%
    # of iterations at one extra solve each (Gondzio 1996).
    for _ in range(opts.gondzio_correctors):
        a_p = jnp.minimum(one, max_step(x, dx))
        a_d = jnp.minimum(one, max_step(s, ds))
        a_pt = jnp.minimum(one, a_p + jnp.asarray(0.1, dtype))
        a_dt = jnp.minimum(one, a_d + jnp.asarray(0.1, dtype))
        x_t = x + a_pt * dx
        s_t = s + a_dt * ds
        v = x_t * s_t
        mu_t = jnp.vdot(x_t, s_t) / n
        lo = jnp.asarray(0.1, dtype) * mu_t
        hi = jnp.asarray(10.0, dtype) * mu_t
        r_xs = v - jnp.clip(v, lo, hi)       # nonzero only for outliers
        ddx, ddy, dds = newton_direction(
            jnp.zeros_like(rp), jnp.zeros_like(rd), r_xs)
        # refine the correction itself (one sweep): round 1 measured that
        # the UNREFINED correction degrades the refined+projected base
        # direction in f32 — the refined form is what makes Gondzio
        # correctors f32-viable (STATUS r1 roadmap #3)
        if fuse:
            from ipx.kernels import fused as fk
            e_p2, t_g = fk.ata_apply(A, ddy, None, ddx)  # A@ddx, A^T ddy
            e_d2 = t_g + dds
        else:
            e_p2 = mv(A, ddx, prec)
            e_d2 = mv(A.T, ddy, prec) + dds
        e_xs2 = r_xs + s * ddx + x * dds
        d3x, d3y, d3s = newton_direction(e_p2, e_d2, e_xs2)
        ddx, ddy, dds = ddx + d3x, ddy + d3y, dds + d3s
        dx_c, dy_c, ds_c = dx + ddx, dy + ddy, ds + dds
        a_p_c = jnp.minimum(one, max_step(x, dx_c))
        a_d_c = jnp.minimum(one, max_step(s, ds_c))
        # accept only a MATERIAL step gain (margin 0.01) and only OUTSIDE
        # the f32 endgame (mu still > 1e-4 mu0): marginal "wins" and
        # endgame corrections were both measured to swap a refined+projected
        # direction for a noisier one and occasionally stall convergence
        endgame = mu < jnp.asarray(1e-4, dtype) * state.mu0
        better_c = (~endgame) & ((a_p_c + a_d_c)
                                 > (a_p + a_d + jnp.asarray(0.01, dtype)))
        dx = jnp.where(better_c, dx_c, dx)
        dy = jnp.where(better_c, dy_c, dy)
        ds = jnp.where(better_c, ds_c, ds)

    # --- damped steps (R9) ----------------------------------------------------
    if opts.adaptive_damping:
        eta = jnp.clip(one - mu, opts.damping_floor, opts.alpha_damping)
    else:
        eta = jnp.asarray(opts.damping_floor, dtype)
    alpha_p = jnp.minimum(one, eta * max_step(x, dx))
    alpha_d = jnp.minimum(one, eta * max_step(s, ds))

    # Centrality backoff (N_{-inf} neighborhood): a full Mehrotra step can
    # crash an individual product x_j s_j orders of magnitude below mu
    # (decentering).  f64 shrugs it off; in f32 the resulting d2 = x/s spread
    # breaks the normal-matrix factorization well before convergence.  Guard:
    # scan alpha backoff factors 1, 1/2, 1/4, ... and take the largest whose
    # post-step min(x_j s_j) >= gamma * mu — pure vectorized VPU work, no
    # extra solves.  (SURVEY.md §7 hard part 1.)
    if opts.backoff_candidates > 0:
        K = opts.backoff_candidates
        gamma = jnp.asarray(opts.neighborhood_gamma, dtype)
        scales = (0.5 ** jnp.arange(K)).astype(dtype)
        xs_all = ((x[None, :] + scales[:, None] * alpha_p * dx[None, :])
                  * (s[None, :] + scales[:, None] * alpha_d * ds[None, :]))
        mu_all = jnp.sum(xs_all, axis=1) / n
        ok = jnp.min(xs_all, axis=1) >= gamma * mu_all
        idx = jnp.where(jnp.any(ok), jnp.argmax(ok), K - 1)
        backoff = scales[idx]
        alpha_p = alpha_p * backoff
        alpha_d = alpha_d * backoff

    floor = jnp.asarray(opts.pos_floor, dtype)
    x_new = jnp.maximum(x + alpha_p * dx, floor)
    y_new = y + alpha_d * dy
    s_new = jnp.maximum(s + alpha_d * ds, floor)

    # --- convergence / failure bookkeeping -----------------------------------
    rp_n, rd_n, mu_n, rp_rel, rd_rel, rel_gap, pobj = _scalars(
        lp, x_new, y_new, s_new, prec, fused=fuse)

    finite = (jnp.all(jnp.isfinite(x_new)) & jnp.all(jnp.isfinite(y_new))
              & jnp.all(jnp.isfinite(s_new)) & jnp.isfinite(rel_gap) & fac.ok)
    # Static (trace-time) feasibility floor at the dtype representation limit.
    eps = float(jnp.finfo(dtype).eps)
    # Representation floor: for (Ruiz-)normalized data the f32 matvec
    # error is a tree-summed random walk ~ c*eps, n-INDEPENDENT (the old
    # eps*sqrt(n) bound assumed |A| entries O(1); at n=2048 it was 2.2e-5
    # — 20x looser than the user's 1e-6, and a final step that DAMAGED
    # feasibility to just under it was certified OPTIMAL: the r4 bf16
    # config-4 runs landed at the floor with ~1e-2 objective error).
    tol_feas = max(opts.tol_feas, opts.feas_eps_mult * eps)
    converged = ((rel_gap <= opts.tol) & (rp_rel <= tol_feas)
                 & (rd_rel <= tol_feas))
    # mu floor: below this, f32 conditioning degrades instead of improving
    # (death-spiral guard).  Report STALLED; the best iterate is returned.
    stalled = mu_n < jnp.asarray(opts.mu_floor_rel, dtype) * state.mu0
    # Windowed progress stall: degenerate endgames can hover at a fixed mu
    # with near-zero steps (f32 normal-matrix rank collapse) — compare
    # against mu from `stall_window` iterations ago (read from the trace
    # buffer) and exit honestly instead of burning the iteration budget.
    # Healthy Mehrotra shrinks mu by ~5-10x per iteration, so the 0.5x /
    # window threshold never fires on a converging run.
    K = opts.stall_window
    if K > 0:
        mu_old = lax.dynamic_slice(
            state.trace, (jnp.maximum(state.it - K, 0), jnp.int32(0)),
            (1, 1))[0, 0]
        no_progress = ((state.it >= K)
                       & (mu_n > jnp.asarray(0.5, dtype) * mu_old))
        # Endgame patience (see options.stall_gap_guard): a near-converged
        # crawl — rel_gap within a small multiple of tol, mu shaving a few
        # %/iteration under ratio-test-noise-collapsed steps (with noisy
        # single-step up-ticks) — must run toward max_iter, not be declared
        # STALLED ~10 crawl-iterations short of the certificate.  Within
        # the guard band the windowed progress test loosens from "halved
        # over the window" to "shrank >=2% over the window": a 1-3%/iter
        # crawl passes easily, a true degenerate hover still exits.
        if opts.stall_gap_guard > 0:
            near = rel_gap <= jnp.asarray(
                opts.stall_gap_guard * opts.tol, dtype)
            crawl_stuck = ((state.it >= K)
                           & (mu_n > jnp.asarray(0.98, dtype) * mu_old))
            no_progress = jnp.where(near, crawl_stuck, no_progress)
        stalled = stalled | no_progress
    # Non-finite step (f32 PSD loss in the endgame): instead of aborting,
    # keep the previous iterate, escalate the Tikhonov regularization, and
    # keep RUNNING — the next factor uses reg * reg_boost.  Only when the
    # boost is exhausted does the instance report NUMERICAL_FAILURE.
    # (Select-based, so it is vmap-safe and costs nothing when healthy.)
    boost_cap = jnp.asarray(opts.reg_boost_cap, dtype)
    exhausted = ~finite & (state.reg_boost >= boost_cap)
    # Escalate on a non-finite step; DECAY back toward 1 on success — a
    # permanently boosted reg caps the reachable accuracy (the direction
    # error ~ reg/(lam+reg) stalls small-curvature coordinates; see
    # options.reg_boost_decay).
    # Adaptive decay floor: every failure raises the floor to 10x the boost
    # that just FAILED, so the decay never revisits a level the problem has
    # already broken at.  Measured at m=4096 (config 4): a fixed floor
    # either caps accuracy (sticky boost -> crawl at rel_gap ~7e-3) or
    # thrashes (floor 10 when the problem needs 100 -> a wasted non-finite
    # iteration every 4th step); the adaptive floor converges to the
    # working level in log_10 steps and decays the 1000x panic right back.
    # Decay applies only to the SHARDED (config-4 scale) route.  There a
    # non-finite step is a transient f32 artifact of the m>=4k assembly and
    # a permanently boosted Tikhonov reg poisons direction quality (error ~
    # reg/(lam+reg) on small-curvature coordinates): measured at m=4096 the
    # sticky boost left the solve crawling at rel_gap ~5e-4, decay reaches
    # ~3e-5.  On the DENSE route the opposite holds: for degenerate
    # instances the boost acts as a needed PROXIMAL term — with decay the
    # fuzz case (50, 55, degenerate, spread 1.5) stalls at 5e-3, with the
    # sticky boost the dense route itself converges OPTIMAL in 20
    # iterations.  The augmented routes handle regularization inside the
    # quasi-definite system, so sticky is free there too.  Static
    # (trace-time) selection.
    decay = (opts.reg_boost_decay if opts.linsys.startswith("sharded")
             else opts.reg_boost_decay_dense)
    reg_floor = jnp.where(
        finite, state.reg_floor,
        jnp.minimum(jnp.maximum(state.reg_floor,
                                state.reg_boost * jnp.asarray(10.0, dtype)),
                    boost_cap))
    reg_boost = jnp.where(
        finite,
        jnp.maximum(reg_floor,
                    state.reg_boost * jnp.asarray(decay, dtype)),
        jnp.minimum(state.reg_boost * jnp.asarray(opts.reg_boost_step, dtype),
                    boost_cap))
    # Divergence-based infeasibility certificates (heuristic, the standard
    # practical IPM tests; the reference class has none at all, SURVEY.md
    # §2.1 R11).  Primal infeasible: the dual iterate diverges along a
    # Farkas ray (y huge, b@y > 0, A^T y + s = c + rd stays bounded — i.e.
    # rd_rel small).  Dual infeasible / primal unbounded: x diverges along
    # a recession ray (x huge, c@x strongly negative, Ax - b bounded).
    thresh = jnp.asarray(opts.infeas_diverge_thresh, dtype)
    ctol = jnp.asarray(1e-4, dtype)
    ynorm = inf_norm(y_new)
    xnorm = inf_norm(x_new)
    by = jnp.vdot(lp.b, y_new)
    cx = jnp.vdot(lp.c, x_new)
    one_b = one + inf_norm(lp.b)
    one_c = one + inf_norm(lp.c)
    # Certificates are statements about the normalized RAY (y/|y|, x/|x|),
    # so residuals must be scaled by the diverging iterate's norm, not by
    # the fixed problem-data denominator inside rd_rel/rp_rel.
    primal_infeas = ((ynorm > thresh) & (by > ctol * ynorm * one_b)
                     & (rd_rel * one_c <= ctol * ynorm))
    dual_infeas = ((xnorm > thresh) & (cx < -ctol * xnorm * one_c)
                   & (rp_rel * one_b <= ctol * xnorm))
    status = jnp.where(
        exhausted, jnp.int32(Status.NUMERICAL_FAILURE),
        jnp.where(finite & converged, jnp.int32(Status.OPTIMAL),
        jnp.where(finite & primal_infeas, jnp.int32(Status.PRIMAL_INFEASIBLE),
        jnp.where(finite & dual_infeas, jnp.int32(Status.DUAL_INFEASIBLE),
                  jnp.where(finite & stalled, jnp.int32(Status.STALLED),
                            jnp.int32(Status.RUNNING))))))

    # On numerical failure keep the last good iterate.
    keep = finite
    x_new = jnp.where(keep, x_new, x)
    y_new = jnp.where(keep, y_new, y)
    s_new = jnp.where(keep, s_new, s)

    # Best-iterate tracking: merit normalizes each criterion by its tolerance
    # so "best" agrees with the convergence test (merit <= 1 iff converged).
    merit = jnp.maximum(
        rel_gap / opts.tol,
        jnp.maximum(rp_rel, rd_rel) / tol_feas)
    better = keep & (merit < state.best_merit)
    best_x = jnp.where(better, x_new, state.best_x)
    best_y = jnp.where(better, y_new, state.best_y)
    best_s = jnp.where(better, s_new, state.best_s)
    best_merit = jnp.where(better, merit, state.best_merit)

    row = jnp.stack([mu_n, rp_rel, rd_rel, rel_gap,
                     alpha_p, alpha_d, sigma, pobj]).astype(dtype)
    trace = lax.dynamic_update_slice(state.trace, row[None, :],
                                     (state.it, jnp.int32(0)))

    return IPMState(
        x=x_new, y=y_new, s=s_new,
        it=state.it + 1, status=status,
        mu=jnp.where(keep, mu_n, state.mu), mu0=state.mu0,
        rp_rel=jnp.where(keep, rp_rel, state.rp_rel),
        rd_rel=jnp.where(keep, rd_rel, state.rd_rel),
        rel_gap=jnp.where(keep, rel_gap, state.rel_gap),
        best_x=best_x, best_y=best_y, best_s=best_s, best_merit=best_merit,
        reg_boost=reg_boost, reg_floor=reg_floor,
        trace=trace,
        # carried residuals follow the same keep-select as the iterate
        # (a reverted non-finite step keeps the old point AND its residuals)
        rp=jnp.where(keep, rp_n, state.rp),
        rd=jnp.where(keep, rd_n, state.rd),
    )


def step_masked(lp: LP, state: IPMState, opts: SolverOptions,
                fac_aat=None, fac=None) -> IPMState:
    """Step only while RUNNING and under the iteration cap; frozen otherwise.

    Written with ``where`` (not ``cond``) so it is vmap-safe: under vmap a
    cond becomes a select anyway (SURVEY.md §7 hard part 5).  The explicit
    ``it < max_iter`` guard keeps any instance from overshooting the cap
    while OTHER batch lanes (or trailing refactor_period steps) keep the
    loop body executing — without it, Solution.iterations could exceed
    max_iter and the final trace row was repeatedly overwritten (ADVICE r4).
    """
    new = mehrotra_step(lp, state, opts, fac_aat, fac)
    active = ((state.status == jnp.int32(Status.RUNNING))
              & (state.it < jnp.int32(opts.max_iter)))
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(active, a, b), new, state)


def step_masked_stale(lp: LP, state: IPMState, opts: SolverOptions,
                      fac_aat, fac, boost0) -> IPMState:
    """Trailing STALE step of a refactor_period block.

    On top of :func:`step_masked`'s freeze conditions, the step is skipped
    once ``reg_boost`` has escalated above ``boost0`` (the level the block's
    factor was built with).  reg_boost only ever rises on a non-finite step,
    so this detects "some step in this block already failed": re-running the
    remaining stale steps would revert to the same iterate with the same
    stale preconditioner and fail identically, multiplying reg_boost toward
    the cap without the boosted regularization ever being TESTED with a
    fresh factor (ADVICE r4, medium).  Skipping hands control back to the
    next block, whose fresh factor actually uses the escalated reg.
    """
    new = mehrotra_step(lp, state, opts, fac_aat, fac)
    active = ((state.status == jnp.int32(Status.RUNNING))
              & (state.it < jnp.int32(opts.max_iter))
              & (state.reg_boost <= boost0))
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(active, a, b), new, state)


def finalize_status(state: IPMState, opts: SolverOptions) -> IPMState:
    """RUNNING after the loop means the iteration cap was hit."""
    import dataclasses
    hit_cap = ((state.status == jnp.int32(Status.RUNNING))
               & (state.it >= opts.max_iter))
    status = jnp.where(hit_cap, jnp.int32(Status.MAX_ITER), state.status)
    return dataclasses.replace(state, status=status)


def warm_start_state(lp: LP, x, y, s, opts: SolverOptions) -> IPMState:
    """Build an initial state from a previous (related) solution.

    A converged point is badly centered for a new IPM run (complementarity
    products at 0); the standard remedy shifts both primal and slack
    variables off their bounds by a mu-sized margin so the first iterations
    re-center instead of stalling on zero ratio tests (warm-start recipe of
    Gondzio & Grothey / Skajaa et al.)."""
    dtype = lp.c.dtype
    x = jnp.asarray(x, dtype)
    y = jnp.asarray(y, dtype)
    s = jnp.asarray(s, dtype)
    mu_seed = jnp.maximum(jnp.vdot(x, s) / lp.n,
                          jnp.asarray(opts.warm_start_mu, dtype))
    shift = jnp.sqrt(mu_seed)
    x = jnp.maximum(x, shift)
    s = jnp.maximum(s, shift)
    mu0 = jnp.vdot(x, s) / lp.n
    return init_state(x, y, s, mu0, opts.max_iter)


def run_single(lp: LP, opts: SolverOptions, state0: IPMState | None = None
               ) -> IPMState:
    """Full solve of one LP: starting point + while_loop. Jit-compatible.

    ``state0`` resumes from a checkpoint (SURVEY.md §5.3/§5.4) or seeds a
    warm start (see :func:`warm_start_state`): the iterate is the complete
    algorithm state, so a warm restart continues exactly; only the
    loop-invariant AA^T factor is recomputed."""
    lp = lp.with_a_storage(opts)
    x0, y0, s0, fac_aat = starting_point(lp, opts)
    if state0 is None:
        mu0 = jnp.vdot(x0, s0) / lp.n
        state0 = init_state(x0, y0, s0, mu0, opts.max_iter)
    state0 = refresh_residuals(lp, state0, opts)

    def cond(st: IPMState):
        return (st.status == jnp.int32(Status.RUNNING)) & (st.it < opts.max_iter)

    if opts.refactor_period == 1:
        def body(st: IPMState):
            return mehrotra_step(lp, st, opts, fac_aat)
    else:
        stale_opts = opts.replace(refine_steps=opts.stale_solve_cg)

        def body(st: IPMState):
            # factor ONCE per body; the k-1 trailing steps reuse it as a
            # (one-iteration-stale) preconditioner — see
            # SolverOptions.refactor_period.  boost0 freezes the trailing
            # steps after any in-block failure (step_masked_stale).
            boost0 = st.reg_boost
            fac = normal_eq.factor(lp.A, st.x / st.s, opts,
                                   reg_scale=st.reg_boost)
            st = mehrotra_step(lp, st, opts, fac_aat, fac)
            for _ in range(opts.refactor_period - 1):
                st = step_masked_stale(lp, st, stale_opts, fac_aat, fac,
                                       boost0)
            return st

    final = lax.while_loop(cond, body, state0)
    return finalize_status(final, opts)
