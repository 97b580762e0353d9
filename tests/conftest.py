"""Test configuration.

Tests run on CPU with 8 virtual devices so every collective/sharded code path
(shard_map + psum/reduce-scatter) is exercised without TPU hardware — the
"fake backend" principle from SURVEY.md §4.2.  Must run before jax imports.
"""
import os
import sys

# jax is already imported by a pytest plugin (jaxtyping) before this conftest
# runs, and the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel).
# Backends initialize lazily, so config.update still takes effect here.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# f64 available for oracle-grade tests; compute dtype stays explicit via
# SolverOptions.dtype so the f32 TPU path is what most tests exercise.
# (This jax build ignores the JAX_ENABLE_X64 env var; use config.update.)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
