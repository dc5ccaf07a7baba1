"""Multi-host orchestration test: 2 real processes over jax.distributed.

Spawns two OS processes (2 virtual CPU devices each) joined through a
localhost coordinator, builds the (host, rollout) mesh, and runs two
MultiStartPlanner steps with the rollout axis spanning both processes —
the first actual exercise of parallel/distributed.py (SURVEY.md
§2.13.5).  The parent asserts both workers print identical replicated
results (deterministic cross-host agreement).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_host_rollout_mesh():
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER],
            env=dict(env, DIST_COORD=coord, DIST_NPROC="2", DIST_PID=str(i)),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
        assert "DIST WORKER OK" in out
        assert "devices: global=4 local=2" in out
        assert "mesh: (2, 2)" in out
    # replicated outputs must agree across hosts bit-for-digit
    results = [re.search(r"result: (.*)", out).group(1)
               for _, out, _ in outs]
    assert results[0] == results[1], results
