"""Real multi-process jax.distributed execution (2 simulated hosts).

Spawns two subprocesses that initialize a jax.distributed cluster over a
local coordinator, build a global (scenario, model) mesh spanning both
processes' CPU devices, feed process-local scenario shards, run a sharded
batched solve, and allgather — the DCN code path (SURVEY.md §5 'distributed
comms backend'; BASELINE.md 'measured at ... >=2 hosts') executed for real,
not simulated with a single-process virtual mesh.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_solve_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    out = os.path.join(tmp_path, "dist_out.npz")

    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # the workers set their own JAX_PLATFORMS/XLA_FLAGS; scrub this process's
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "mpc_tpu.parallel._dist_worker",
             str(port), str(pid), "2", out],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout.decode(errors="replace"))
    rcs = [p.returncode for p in procs]
    assert rcs == [0, 0], f"worker exit codes {rcs}\n--- worker 0 ---\n" \
        f"{logs[0]}\n--- worker 1 ---\n{logs[1]}"

    data = np.load(out)
    assert data["converged"].all()
    # the box-QP solution is clip(t): exact parity with the analytic optimum
    np.testing.assert_allclose(data["u"], np.clip(data["ts"], -1, 1),
                               atol=1e-4)
