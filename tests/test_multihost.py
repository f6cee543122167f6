"""2-process jax.distributed CPU test of parallel/multihost.py.

Spawns two subprocesses, each a simulated pod host with 4 virtual CPU
devices, connected through the JAX distributed runtime — validating
make_pod_mesh / host_local_batch_to_global / host_trajectory_indices and a
full SPMD train step beyond the process_count == 1 degenerate branch
(VERDICT r1 item 3c).
"""
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_pod_mesh():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=ROOT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))

    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert line, f"worker {i} produced no OK line:\n{out[-3000:]}"
        losses.append(float(line[0].split("loss=")[1]))
    # SPMD: both hosts computed the same global loss
    assert abs(losses[0] - losses[1]) < 1e-6, losses
