"""Test configuration.

Tests run on CPU with 8 virtual devices so every collective/sharded code path
(shard_map + psum/reduce-scatter) is exercised without TPU hardware — the
"fake backend" principle from SURVEY.md §4.2.  Must run before jax imports.
"""
import os
import resource
import sys

# The XLA CPU compiler segfaulted nondeterministically ~150 compiles into a
# single-process full-suite run (stack overflow in LLVM codegen on the main
# thread — the Linux main stack grows only up to the soft rlimit, 8MB here).
# Raise the ceiling before any heavy compilation; pytest.ini additionally
# spreads the suite over xdist workers so no process compiles everything.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 << 20
if _soft != resource.RLIM_INFINITY and _soft < _want:
    _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))

# jax is already imported by a pytest plugin (jaxtyping) before this conftest
# runs, and the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel).
# Backends initialize lazily, so config.update still takes effect here.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite compiles a few hundred XLA
# programs; warm reruns skip nearly all of that (and fewer live compiles
# per process also derisks the CPU-compiler stack issue above).
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# f64 available for oracle-grade tests; compute dtype stays explicit via
# SolverOptions.dtype so the f32 TPU path is what most tests exercise.
# (This jax build ignores the JAX_ENABLE_X64 env var; use config.update.)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
