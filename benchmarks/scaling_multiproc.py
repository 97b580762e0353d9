"""Two-process scaling-efficiency point (BASELINE config 5 reporting,
VERDICT r2 item 6): the same batch-sharded fixed-iteration throughput
measurement as benchmarks/scaling.py, but run SPMD across 2 OS processes
connected by ``mesh.init_distributed`` (the DCN bootstrap path) — config 5
minus the physical hosts.

Launch (driver):   python benchmarks/scaling_multiproc.py
Worker (internal): python benchmarks/scaling_multiproc.py <pid> <nproc> <coord>

Process 0 appends one JSONL row to ``benchmarks/scaling_r3_virtual.jsonl``
with ``processes: 2`` so the record sits next to the single-process
virtual-mesh points.
"""
from __future__ import annotations

import functools
import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
DEV_PER_PROC = 4
M, N, PER_DEV_B = 256, 512, 4
ITERS = 6


def driver() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    nproc = 2
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(pid), str(nproc),
         coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(nproc)]
    rc = 0
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=1200)
        print(f"--- worker {pid} (rc={p.returncode}) ---\n{out[-2000:]}")
        rc |= p.returncode
    return rc


def worker(pid: int, nproc: int, coord: str) -> int:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{DEV_PER_PROC}")
    sys.path.insert(0, os.path.dirname(HERE))
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    import ipx
    from ipx import mesh as meshlib
    from ipx.ipm import batched
    from ipx.problem.lp import LP
    from ipx.problem.generate import random_feasible_lp

    meshlib.init_distributed(coordinator_address=coord,
                             num_processes=nproc, process_id=pid)
    ndev = len(jax.devices())
    assert ndev == DEV_PER_PROC * nproc, ndev
    B = ndev * PER_DEV_B

    gs = [random_feasible_lp(M, N, seed=i % 8) for i in range(B)]
    c = np.stack([g.c for g in gs]).astype(np.float32)
    A = np.stack([g.A for g in gs]).astype(np.float32)
    b = np.stack([g.b for g in gs]).astype(np.float32)
    mesh = meshlib.make_mesh(batch=ndev, row=1)
    sh = meshlib.batch_lp_sharding(mesh)

    def put(x, s):
        return jax.make_array_from_callback(
            x.shape, s, lambda idx: np.ascontiguousarray(x[idx]))

    blp = LP(c=put(c, sh["c"]), A=put(A, sh["A"]), b=put(b, sh["b"]),
             obj_offset=put(np.zeros((B,), np.float32), sh["obj_offset"]))
    opts = ipx.SolverOptions(dtype="float32", max_iter=ITERS + 1)

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def fixed(blp, st, fac, k, o):
        return batched.run_batch_fixed_iters(blp, st, k, o, fac)

    @functools.partial(jax.jit, static_argnums=(1,))
    def start(blp, o):
        return batched.batch_starting_state(blp, o)

    from jax.experimental import multihost_utils
    st0, fac = start(blp, opts)

    def run(k):
        out = fixed(blp, st0, fac, k, opts)
        # global sync point on every process
        return float(np.asarray(
            multihost_utils.process_allgather(out.mu, tiled=True)).sum())

    k1, k2 = 2, ITERS
    run(k1)
    run(k2)

    def best(k):
        ts = []
        for _ in range(3):
            multihost_utils.sync_global_devices("t0")
            t0 = time.perf_counter()
            run(k)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_iter = max((best(k2) - best(k1)) / (k2 - k1), 1e-9)
    if pid == 0:
        rec = {"devices": ndev, "processes": nproc, "batch": B,
               "m": M, "n": N,
               "sec_per_batched_iter": round(t_iter, 6),
               "instance_iters_per_s": round(B / t_iter, 2),
               "note": "2 OS processes over jax.distributed (DCN bootstrap "
                       "path), virtual CPU devices"}
        out_path = os.environ.get(
            "IPX_SCALING_OUT", os.path.join(HERE, "scaling_r4.jsonl"))
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print("RESULT", json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 1:
        sys.exit(driver())
    sys.exit(worker(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]))
