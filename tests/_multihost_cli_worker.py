"""Worker for the 2-process multi-host trainer-CLI test
(tests/test_multihost_cli.py).

Each process: virtual 2-device CPU backend -> cli.train_latent.main with a
per-process exp dir -> prints a parameter fingerprint.  The test asserts
exactly-once global data coverage (via --record_data), identical post-
training parameters on both hosts (gradient psum correctness through the
REAL trainer), and that only the main process wrote logs/checkpoints.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402


def main(feature_dir, exp_base, record_base):
    from codlad_tpu.cli.train_latent import main as train_main
    from codlad_tpu.train import mesh as mesh_mod

    pid, pcount = mesh_mod.maybe_init_distributed()
    assert pcount == 2, f"expected 2 processes, got {pcount}"

    # exp dir is SHARED across processes (orbax saves are collective:
    # every process calls save, only the primary host writes)
    state = train_main([
        "--feature_dir", feature_dir,
        "--exp", exp_base,
        "--model", "diffusion", "--latent_size", "3",
        "--batch_size", "4", "--epochs", "1", "--max_steps", "5",
        "--warmup", "2", "--save_step", "100", "--log_step", "2",
        "--dropout", "0.0", "--val_every_epochs", "5",
        "--record_data", record_base,
    ])

    leaves = jax.tree.leaves(state.params)
    fp = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
    print(f"CLI_OK pid={pid} step={int(state.step)} fp={fp:.10e}", flush=True)


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
