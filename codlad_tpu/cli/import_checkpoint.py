"""Convert a reference (torch) checkpoint into this framework's format.

Usage:
  python -m codlad_tpu.cli.import_checkpoint \
      --torch_ckpt /path/to/model.pt --kind genzprot --out results/c2_imported

The produced directory is a normal CheckpointManager dir ('last' +
modelparams.json) usable by cli/test (e.g. --experiment genzprot).  See
convert/torch_import.py for exactness guarantees and the tensor-product
basis caveat.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", type=str, required=True)
    p.add_argument("--kind", type=str, default="genzprot", choices=["genzprot"])
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--dec_nconv", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import numpy as np
    import optax

    from codlad_tpu.convert.torch_import import convert_genzprot
    from codlad_tpu.train.checkpoints import CheckpointManager
    from codlad_tpu.train.state import create_train_state

    params = convert_genzprot(args.torch_ckpt, num_conv=args.dec_nconv)
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    print(f"imported {n:,} parameters from {args.torch_ckpt}")

    state = create_train_state(params, optax.identity())
    ckpt = CheckpointManager(args.out)
    ckpt.save_config({
        "train_section": "ivae", "embed_dim": 36, "n_rbf": 15,
        "cg_cutoff": 21.0, "atom_cutoff": 9.0, "enc_nconv": 3,
        "dec_nconv": args.dec_nconv, "imported_from": args.torch_ckpt,
    })
    ckpt.save(state, "last")
    print(f"wrote {args.out}/last")


if __name__ == "__main__":
    main()
