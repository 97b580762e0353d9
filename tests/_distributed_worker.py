"""Worker process for the multi-process bootstrap rehearsal (VERDICT r1
item 5; BASELINE config 5 minus the hardware).

Launched by tests/test_distributed.py as N separate OS processes.  Each
process owns 2 virtual CPU devices; ``mesh.init_distributed`` (the DCN
bootstrap path, ipx/mesh.py) connects them into one JAX cluster, after which
the GLOBAL mesh spans N*2 devices and a batch-sharded solve runs SPMD across
processes — the same code path a v5p multi-host run takes over DCN.

Usage: python _distributed_worker.py <process_id> <num_processes> <coord>
Prints "RESULT <max_rel_err>" on process 0 when the sharded solve agrees
with the constructed optima.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]

    from ipx import mesh as meshlib
    meshlib.init_distributed(coordinator_address=coord,
                             num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    ndev = len(jax.devices())
    assert ndev == 2 * nproc, ndev

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    import ipx
    from ipx.ipm import batched
    from ipx.problem.lp import LP
    from ipx.problem.generate import random_feasible_lp

    B, m, n = ndev, 16, 32
    gs = [random_feasible_lp(m, n, seed=i) for i in range(B)]  # same on all procs
    c = np.stack([g.c for g in gs]).astype(np.float32)
    A = np.stack([g.A for g in gs]).astype(np.float32)
    b = np.stack([g.b for g in gs]).astype(np.float32)

    mesh = meshlib.make_mesh(batch=ndev, row=1)
    sh = meshlib.batch_lp_sharding(mesh)
    # batch axis sharded across ALL processes; row axis size 1.  Each process
    # contributes only its addressable shards via make_array_from_callback.
    def put(x, s):
        return jax.make_array_from_callback(
            x.shape, s, lambda idx: np.ascontiguousarray(x[idx]))

    blp = LP(c=put(c, sh["c"]), A=put(A, sh["A"]), b=put(b, sh["b"]),
             obj_offset=put(np.zeros((B,), np.float32), sh["obj_offset"]))

    opts = ipx.SolverOptions(dtype="float32", max_iter=32)
    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(blp, opts):
        st = batched.run_batch(blp, opts)
        obj = jnp.einsum("bn,bn->b", blp.c, st.best_x)
        return obj, st.status

    obj, status = run(blp, opts)
    from jax.experimental import multihost_utils
    obj_all = multihost_utils.process_allgather(obj, tiled=True)
    status_all = multihost_utils.process_allgather(status, tiled=True)

    ref = np.array([g.obj_star for g in gs])
    rel = np.abs(np.asarray(obj_all) - ref) / (1 + np.abs(ref))
    ok_status = np.all(np.asarray(status_all) == 1)  # Status.OPTIMAL
    if pid == 0:
        print(f"RESULT {float(rel.max()):.3e} status_ok={bool(ok_status)}",
              flush=True)
    if not ok_status or rel.max() > 5e-5:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
