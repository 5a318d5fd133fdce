"""2-process CPU multi-host test: jax.distributed init + per-host data
loading + cross-process gradient reduction (SURVEY §5.8; the reference's
only distributed mode is DDP via Accelerate/NCCL, train_latent.py:41-153).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # two-process subprocess DP runs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_step():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            # the workers configure their own virtual CPU backend
            "XLA_FLAGS": "",
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_multihost_worker.py")],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
    # both processes computed the identical psum'd loss
    l0 = [ln for ln in outs[0].splitlines() if "MULTIHOST_OK" in ln][0]
    l1 = [ln for ln in outs[1].splitlines() if "MULTIHOST_OK" in ln][0]
    assert l0.split("loss=")[1] == l1.split("loss=")[1]
