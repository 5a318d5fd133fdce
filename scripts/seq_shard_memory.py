"""Long-chain justification for ring-kNN sequence sharding (docs/DESIGN.md §7).

Compares the XLA-compiled per-device memory footprint of ONE denoiser
forward at production width (hidden 128, k=64, enc/dec 3 layers — the
bench.py model) between

  * dense:   the whole chain on one device, and
  * sharded: residues sharded over an 8-device mesh (ring-kNN streams the
    only O(L^2) object, so per-device memory should scale ~1/N plus the
    all-gathered O(L) node tables).

Memory comes from XLA's own allocation accounting
(`compiled.memory_analysis()`), which is what the TPU allocator will
actually reserve — no runtime needed, so this runs on the virtual CPU
mesh and the numbers transfer to any backend modulo layout padding.

Run: python scripts/seq_shard_memory.py [L ...]   (default 1024 2048)
"""

import functools
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from codlad_tpu.models.denoiser import mpnn_diffusion  # noqa: E402

N_SHARDS = 8
B = 1


def footprint(lowered):
    m = lowered.compile().memory_analysis()
    return dict(temp=m.temp_size_in_bytes, args=m.argument_size_in_bytes,
                out=m.output_size_in_bytes)


def main(lengths):
    kw = dict(input_size=3, learn_sigma=True, dropout=0.0)
    dense = mpnn_diffusion(**kw)
    sharded = mpnn_diffusion(**kw, seq=("seq", N_SHARDS))
    mesh = Mesh(np.array(jax.devices()), ("seq",))
    rows = []
    for L in lengths:
        rng = np.random.default_rng(0)
        steps = rng.normal(size=(B, L, 3))
        steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
        cg = jnp.asarray(np.cumsum(3.8 * steps, axis=1).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
        res = jnp.asarray(rng.integers(0, 20, size=(B, L)).astype(np.int32))
        mask = jnp.ones((B, L), jnp.float32)
        t = jnp.zeros((B,), jnp.int32)

        d = jax.jit(functools.partial(dense.apply, deterministic=True))
        f_dense = footprint(d.lower(
            jax.eval_shape(lambda: dense.init(jax.random.PRNGKey(0), x, t,
                                              res, cg, mask)),
            x, t, res, cg, mask))

        def f(params, x, t, res, cg, mask):
            return sharded.apply(params, x, t, res, cg, mask,
                                 deterministic=True)

        fn = jax.jit(shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(None, "seq", None), P(), P(None, "seq"),
                      P(None, "seq", None), P(None, "seq")),
            out_specs=P(None, "seq", None)))
        f_shard = footprint(fn.lower(
            jax.eval_shape(lambda: dense.init(jax.random.PRNGKey(0), x, t,
                                              res, cg, mask)),
            x, t, res, cg, mask))

        MB = 1024 ** 2
        rows.append({"L": L,
                     "dense_temp_mb": round(f_dense["temp"] / MB, 1),
                     "sharded_temp_mb_per_dev": round(f_shard["temp"] / MB, 1),
                     "ratio": round(f_dense["temp"] / max(f_shard["temp"], 1),
                                    2)})
        print(rows[-1], flush=True)
    return rows


if __name__ == "__main__":
    ls = [int(a) for a in sys.argv[1:]] or [1024, 2048]
    main(ls)
