"""Regression pins for the route-dependent reg-boost policy (VERDICT r2
weak #8 / next-round #8).

The policy under test (mehrotra.py reg-boost block, options.py
reg_boost_decay*): after a NON-finite step the Tikhonov boost escalates
(x reg_boost_step) and the decay floor rises to 10x the level that just
failed; after a finite step the boost DECAYS back toward the floor on the
SHARDED route (a permanent boost caps config-4 accuracy — measured m=4096:
sticky crawls at rel_gap ~5e-4, decay reaches ~3e-5) but stays STICKY on
the dense route (for degenerate instances it acts as a proximal term).

These are mechanics pins: they drive mehrotra_step directly with crafted
states so the decision boundary (options.py reg_boost_decay vs
reg_boost_decay_dense x linsys) is exercised deterministically on every
platform, independent of whether a given instance happens to hit f32 PSD
loss on this host's arithmetic.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ipx
from ipx import mesh as meshlib
from ipx.ipm import mehrotra
from ipx.ipm.state import init_state
from ipx.linsys import schur
from ipx.problem.lp import LP
from ipx.problem.generate import random_feasible_lp


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 (virtual) devices")


def _lp_and_state(m=16, n=32, seed=0, boost=1e3, floor=10.0):
    g = random_feasible_lp(m, n, seed=seed)
    lp = LP(c=jnp.asarray(g.c, jnp.float32), A=jnp.asarray(g.A, jnp.float32),
            b=jnp.asarray(g.b, jnp.float32),
            obj_offset=jnp.zeros((), jnp.float32))
    x0 = jnp.ones((n,), jnp.float32)
    s0 = jnp.ones((n,), jnp.float32)
    y0 = jnp.zeros((m,), jnp.float32)
    st = init_state(x0, y0, s0, jnp.asarray(1.0, jnp.float32), max_iter=8)
    st = dataclasses.replace(st,
                             reg_boost=jnp.asarray(boost, jnp.float32),
                             reg_floor=jnp.asarray(floor, jnp.float32))
    # hand-built states must seed the carried residuals like run entry does
    st = mehrotra.refresh_residuals(lp, st, ipx.SolverOptions(
        dtype="float32", max_iter=8))
    return lp, st


def test_dense_route_boost_is_sticky():
    """Dense route, finite step: a prior boost must NOT decay (default
    reg_boost_decay_dense=1.0 — the proximal-term behavior the degenerate
    fuzz battery relies on)."""
    lp, st = _lp_and_state()
    opts = ipx.SolverOptions(dtype="float32", max_iter=8)
    new = jax.jit(lambda l, s: mehrotra.mehrotra_step(l, s, opts))(lp, st)
    assert np.isfinite(float(new.mu))           # the step itself was healthy
    assert float(new.reg_boost) == pytest.approx(1e3)
    assert float(new.reg_floor) == pytest.approx(10.0)


def test_dense_route_decay_knob_applies():
    """The explicit dense-decay knob drives the same decay algebra (floored
    at reg_floor) — the boundary is the OPTION, not a hidden constant."""
    lp, st = _lp_and_state()
    opts = ipx.SolverOptions(dtype="float32", max_iter=8,
                             reg_boost_decay_dense=0.1)
    new = jax.jit(lambda l, s: mehrotra.mehrotra_step(l, s, opts))(lp, st)
    assert float(new.reg_boost) == pytest.approx(100.0)   # 1e3 * 0.1 > floor


@needs_8
def test_sharded_route_boost_decays():
    """Sharded route, finite step: the boost decays toward the floor —
    the config-4 accuracy fix (a sticky boost permanently caps rel_gap)."""
    lp, st = _lp_and_state(m=16, n=32)
    mesh = meshlib.make_mesh(batch=1, row=8)
    opts = ipx.SolverOptions(dtype="float32", max_iter=8, linsys="sharded")
    with schur.use_mesh(mesh):
        new = jax.jit(lambda l, s: mehrotra.mehrotra_step(l, s, opts))(lp, st)
    assert np.isfinite(float(new.mu))
    assert float(new.reg_boost) == pytest.approx(100.0)   # 1e3 * 0.1
    # and the decay never goes below the failure floor:
    lp2, st2 = _lp_and_state(boost=20.0, floor=10.0)
    with schur.use_mesh(mesh):
        new2 = jax.jit(lambda l, s: mehrotra.mehrotra_step(l, s, opts))(
            lp2, st2)
    assert float(new2.reg_boost) == pytest.approx(10.0)   # max(floor, 2.0)


def test_nonfinite_step_escalates_and_raises_floor():
    """A non-finite step must escalate the boost and raise the decay floor
    to 10x the boost that just failed (both routes share this half)."""
    lp, st = _lp_and_state(boost=1e3, floor=1.0)
    # poison the iterate: every residual/solve goes NaN -> finite=False
    st = dataclasses.replace(
        st, x=st.x.at[0].set(jnp.nan), best_merit=st.best_merit)
    opts = ipx.SolverOptions(dtype="float32", max_iter=8)
    new = jax.jit(lambda l, s: mehrotra.mehrotra_step(l, s, opts))(lp, st)
    assert float(new.reg_boost) == pytest.approx(1e6)     # 1e3 * step(1e3)
    assert float(new.reg_floor) == pytest.approx(1e4)     # 10x failed level
    # escalation saturates at the cap
    st_cap = dataclasses.replace(st, reg_boost=jnp.asarray(1e9, jnp.float32))
    new_cap = jax.jit(lambda l, s: mehrotra.mehrotra_step(l, s, opts))(
        lp, st_cap)
    assert float(new_cap.reg_boost) == pytest.approx(opts.reg_boost_cap)
