"""2-process multi-host test of the REAL Stage-2 trainer CLI (VERDICT r2
item 2): per-host data striping, rank-gated logging/checkpointing, and
lockstep parameter updates through cli.train_latent.main itself.

Asserts:
  (a) every (file, row) sample is consumed exactly once GLOBALLY —
      disjoint per-host stripes covering the dataset;
  (b) both processes hold identical post-training parameters (the psum'd
      gradients agree through the full trainer, not just a primitive);
  (c) logs / metrics / checkpoints are written by the main process only.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two-process trainer CLI subprocess run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_features(directory, n_files=2, frames=9, L=12, seed=0):
    """Synthetic extract_features-style output (latents + conditioning)."""
    os.makedirs(directory, exist_ok=True)
    rng = np.random.default_rng(seed)
    total = []
    for i in range(n_files):
        name = f"prot_{i:04d}.npz"
        steps = rng.normal(size=(frames, L + 2, 3))
        steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
        cg = np.cumsum(3.8 * steps, axis=1).astype(np.float32)
        np.savez(os.path.join(directory, name),
                 latents=rng.normal(size=(frames, L, 3)).astype(np.float32),
                 res_type=rng.integers(0, 20, size=(frames, L)).astype(np.int32),
                 cg_xyz_og=cg,
                 res_mask=np.ones((frames, L), bool))
        total += [f"{name}:{r}" for r in range(frames)]
    return set(total)


def test_two_process_trainer_cli(tmp_path):
    feat = str(tmp_path / "features")
    expected = _make_features(feat)
    exp_base = str(tmp_path / "exp")
    record_base = str(tmp_path / "consumed")

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "XLA_FLAGS": "",
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_multihost_cli_worker.py"),
             feat, exp_base, record_base],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "CLI_OK" in out, out

    # (a) exactly-once global coverage: stripes disjoint, union == dataset
    consumed = []
    for pid in range(2):
        with open(f"{record_base}.p{pid}") as f:
            consumed.append(set(ln.strip() for ln in f if ln.strip()))
    assert consumed[0].isdisjoint(consumed[1]), (
        consumed[0] & consumed[1])
    assert consumed[0] | consumed[1] == expected

    # (b) identical post-training parameters on both hosts
    fps = []
    for out in outs:
        line = [ln for ln in out.splitlines() if "CLI_OK" in ln][0]
        fps.append(line.split("fp=")[1])
        assert "step=5" in line, line
    assert fps[0] == fps[1], fps

    # (c) one copy of logs/metrics in the SHARED exp dir (rank gating):
    # if the non-main process also wrote, lines/rows would be duplicated
    with open(os.path.join(exp_base, "log.txt")) as f:
        log = f.read()
    assert log.count("training done") == 1, log
    import json
    with open(os.path.join(exp_base, "metrics.jsonl")) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    steps_logged = [r["step"] for r in rows if r["split"] == "train"]
    assert len(steps_logged) == len(set(steps_logged)), steps_logged
    assert os.path.exists(os.path.join(exp_base, "modelparams.json"))
    assert os.path.isdir(os.path.join(exp_base, "last"))
