"""Worker for the 2-process CPU multi-host test (tests/test_multihost.py).

Each process: virtual 2-device CPU backend -> jax.distributed init via the
env-var hook (train/mesh.maybe_init_distributed) -> global 4-device mesh ->
one data-parallel gradient step with PER-HOST data (the reference's DDP
semantics: per-process batch split + gradient all-reduce,
train_latent.py:54,251).  Prints a single parseable OK line.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402

from codlad_tpu.train import mesh as mesh_mod  # noqa: E402


def main():
    pid, pcount = mesh_mod.maybe_init_distributed()
    assert pcount == 2, f"expected 2 processes, got {pcount}"
    assert len(jax.devices()) == 4, jax.devices()

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    ids = multihost_utils.process_allgather(np.array([pid], np.int32))
    assert sorted(np.ravel(ids).tolist()) == [0, 1], ids

    # per-host data: different rows per process, global batch 8
    mesh = mesh_mod.make_mesh()
    rng = np.random.default_rng(100 + pid)
    local = {"x": rng.normal(size=(4, 16)).astype(np.float32)}
    gbatch = mesh_mod.shard_batch(local, mesh)
    assert gbatch["x"].shape == (8, 16)

    w = mesh_mod.replicate(jnp.ones((16,), jnp.float32) * 0.1, mesh)

    @jax.jit
    def loss_and_grad(w, x):
        def loss(w):
            return jnp.mean((x @ w) ** 2)
        return jax.value_and_grad(loss)(w)

    loss, grad = loss_and_grad(w, gbatch["x"])
    # the psum'd loss/grad must be identical on every process
    loss = float(loss)
    g0 = float(np.asarray(grad)[0])
    agree = multihost_utils.process_allgather(
        np.array([loss, g0], np.float64))
    a = np.asarray(agree).reshape(2, 2)
    assert np.allclose(a[0], a[1]), a
    print(f"MULTIHOST_OK pid={pid} pcount={pcount} loss={loss:.6f}",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
