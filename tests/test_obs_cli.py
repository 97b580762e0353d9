"""Tests: checkpoint/resume, bucketed batching, CLI (SURVEY.md N14/N16,
§5.3 fault-injection principle: kill mid-solve, resume, same objective)."""
import json
import subprocess
import sys
import os

import numpy as np
import pytest

import ipx
from ipx import obs
from ipx.problem.generate import random_feasible_lp
from ipx.problem import batching
from ipx.status import Status


# ---------------------------------------------------------------------------
# checkpoint / resume (fault injection)
# ---------------------------------------------------------------------------

def test_checkpoint_resume_same_objective(tmp_path):
    g = random_feasible_lp(40, 80, seed=3)
    opts = ipx.SolverOptions(dtype="float32")

    full = ipx.solve(g.c, g.A, g.b, options=opts)
    assert full.optimal

    # "fault": stop after 4 iterations, checkpoint, then resume
    ck = str(tmp_path / "st.npz")
    part = ipx.solve(g.c, g.A, g.b,
                     options=opts.replace(max_iter=4), checkpoint_to=ck)
    assert part.status == int(Status.MAX_ITER)
    res = ipx.solve(g.c, g.A, g.b, options=opts, resume_from=ck)
    assert res.optimal
    rel = abs(res.objective - full.objective) / (1 + abs(full.objective))
    assert rel <= 1e-6
    # resumed run continued, not restarted
    assert res.iterations > 4
    assert res.iterations <= full.iterations + 4


def test_state_roundtrip(tmp_path):
    g = random_feasible_lp(20, 40, seed=1)
    ck = str(tmp_path / "s.npz")
    ipx.solve(g.c, g.A, g.b, options=ipx.SolverOptions(dtype="float32"),
              checkpoint_to=ck)
    st = obs.load_state(ck)
    assert st.x.shape == (40,)
    assert int(st.status) == int(Status.OPTIMAL)


def test_timed_section():
    sink = []
    with obs.timed_section("work", sink):
        sum(range(1000))
    assert sink and sink[0].seconds >= 0


# ---------------------------------------------------------------------------
# bucketed batching
# ---------------------------------------------------------------------------

def test_pad_lp_solution_invariant():
    g = random_feasible_lp(30, 60, seed=5)
    p = batching.pad_lp(g.c, g.A, g.b, 48, 96)
    opts = ipx.SolverOptions(dtype="float64")
    sol_pad = ipx.solve(p.lp, options=opts)
    sol_orig = ipx.solve(g.c, g.A, g.b, options=opts)
    assert sol_pad.optimal
    rel = abs(sol_pad.objective - sol_orig.objective) / (1 + abs(sol_orig.objective))
    assert rel <= 1e-8
    np.testing.assert_allclose(p.unpad_x(sol_pad.x), sol_orig.x, atol=1e-6)


def test_bucket_lps_groups_and_solves():
    rng = np.random.default_rng(0)
    problems = []
    gens = []
    for i, (m, n) in enumerate([(10, 25), (12, 30), (40, 90), (11, 28)]):
        g = random_feasible_lp(m, n, seed=i)
        gens.append(g)
        problems.append((g.c, g.A, g.b))
    buckets = batching.bucket_lps(problems, m_multiple=8, n_multiple=16)
    # similar small shapes share a bucket; the large one is separate
    assert len(buckets) == 2
    from ipx.ipm.batched import stack_lps
    opts = ipx.SolverOptions(dtype="float32")
    results = {}
    for shape, items in buckets.items():
        sols = ipx.solve_batch(stack_lps([p.lp for _, p in items]),
                               options=opts)
        for (idx, p), s in zip(items, sols):
            results[idx] = (p, s)
    for i, g in enumerate(gens):
        p, s = results[i]
        assert s.optimal
        rel = abs(s.objective - g.obj_star) / (1 + abs(g.obj_star))
        assert rel <= 5e-6


def test_pad_lp_rejects_too_small_bucket():
    g = random_feasible_lp(10, 20, seed=0)
    with pytest.raises(ValueError):
        batching.pad_lp(g.c, g.A, g.b, 16, 22)   # no room for 6 row slacks


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))


def test_cli_random_json():
    r = subprocess.run(
        [sys.executable, "-m", "ipx", "random", "--m", "20", "--n", "40",
         "--json", "--quiet", "--platform", "cpu"],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["status"] == "OPTIMAL"


def test_cli_solve_mps(tmp_path):
    mps = tmp_path / "t.mps"
    mps.write_text("""\
NAME T
ROWS
 N obj
 G g1
COLUMNS
    x obj 2.0 g1 1.0
    y obj 3.0 g1 1.0
RHS
    rhs g1 4.0
ENDATA
""")
    r = subprocess.run(
        [sys.executable, "-m", "ipx", "solve", str(mps), "--json", "--quiet",
         "--dtype", "float64", "--platform", "cpu"],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["status"] == "OPTIMAL"
    assert abs(out["objective"] - 8.0) < 1e-6   # min 2x+3y, x+y>=4 -> x=4


def test_periodic_snapshots(tmp_path):
    """SURVEY §5.3 periodic in-solve snapshots (VERDICT r1 weak #7): the
    chunked driver checkpoints every k iterations; killing and re-running
    resumes from the snapshot and reaches the same optimum."""
    import os
    import ipx
    from ipx import obs
    from ipx.problem.generate import random_feasible_lp

    g = random_feasible_lp(30, 60, seed=5)
    path = str(tmp_path / "snap.npz")
    opts = ipx.SolverOptions(dtype="float32", max_iter=40)
    sol = obs.solve_with_snapshots(g.c, g.A, g.b, options=opts,
                                   every=3, path=path)
    assert sol.optimal
    rel = abs(sol.objective - g.obj_star) / (1 + abs(g.obj_star))
    assert rel <= 2e-6
    # snapshot exists and holds a mid/final state
    assert os.path.exists(path)
    st = obs.load_state(path)
    assert int(st.it) >= 3
    # "crash recovery": re-running with the snapshot present resumes and
    # returns the converged solution immediately
    sol2 = obs.solve_with_snapshots(g.c, g.A, g.b, options=opts,
                                    every=3, path=path)
    assert sol2.optimal


def test_checked_solve_clean_run():
    """checkify integration (SURVEY §5.2): a healthy solve raises no float
    errors; the state matches the normal path's convergence."""
    import jax.numpy as jnp
    import ipx
    from ipx import obs
    from ipx.problem.generate import random_feasible_lp
    from ipx.problem.lp import make_lp
    from ipx.status import Status

    g = random_feasible_lp(20, 40, seed=6)
    lp = make_lp(g.c, g.A, g.b).astype(jnp.float32)
    err, st = obs.checked_solve(
        lp, ipx.SolverOptions(dtype="float32", max_iter=30,
                              # the deliberate NaN-recovery path (reg_boost)
                              # must stay quiet on a healthy instance
                              ))
    assert int(st.status) == int(Status.OPTIMAL)
    err.throw()   # no error on a clean run


def test_cli_backend_choices_round_trip():
    """Every SolverOptions-legal backend name must be reachable by CLI flag
    (VERDICT r4 weak #4: the flag lists had gone stale and the production
    default 'panels' was unreachable by name)."""
    import argparse
    from ipx.cli import _add_solver_flags, _build_options
    from ipx.options import CHOL_BACKEND_CHOICES, LINSYS_CHOICES

    for name in CHOL_BACKEND_CHOICES:
        p = argparse.ArgumentParser()
        _add_solver_flags(p)
        args = p.parse_args(["--chol-backend", name])
        assert _build_options(args).chol_backend == name
    for name in LINSYS_CHOICES:
        p = argparse.ArgumentParser()
        _add_solver_flags(p)
        args = p.parse_args(["--linsys", name])
        assert _build_options(args).linsys == name
