"""Multi-process bootstrap rehearsal (VERDICT r1 item 5; SURVEY.md §3.5).

Launches 2 OS processes, each with 2 virtual CPU devices, connects them via
``mesh.init_distributed`` (jax.distributed.initialize over a local
coordinator — the exact DCN bootstrap path of BASELINE config 5), builds the
4-device GLOBAL mesh, and runs a batch-sharded solve SPMD across the
processes.  This is everything config 5 does except the physical v5p hosts.
"""
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_bootstrap_and_sharded_solve():
    nproc = 2
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(nproc)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    assert any("RESULT" in o and "status_ok=True" in o for o in outs), outs
