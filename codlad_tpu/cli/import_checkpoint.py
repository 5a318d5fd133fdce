"""Convert a reference (torch) checkpoint into this framework's format.

Usage:
  # GenZProt (C2):
  python -m codlad_tpu.cli.import_checkpoint \
      --torch_ckpt /path/to/model.pt --kind genzprot --out results/c2_imported

  # VQ-VAE (N6 / K3 / K4): point at the checkpoint DIRECTORY and pick the
  # reference's model number semantics (model_module.py:111-116):
  #   --modelnum -1  -> model.pt          (default)
  #   --modelnum 999 -> best_model.pt
  #   --modelnum N   -> model_N.pt
  python -m codlad_tpu.cli.import_checkpoint \
      --torch_ckpt results/Vae_vqvaeangle_PDB_ns36_vq3_vq4096 --modelnum 999 \
      --kind vqvae --out results/k3_imported

The produced directory is a normal CheckpointManager dir ('last' +
modelparams.json) usable by cli/test (--experiment recon/genzprot) and
cli/extract_features.  The K3/K4 IC_Decoder_angle layout is auto-detected
from the state dict (convert/torch_import.is_angle_layout) and recorded as
predict_angle in modelparams.json.  See convert/torch_import.py for
exactness guarantees and the tensor-product basis caveat.
"""

from __future__ import annotations

import argparse
import os


def resolve_ckpt_file(path, modelnum=-1):
    """Reference checkpoint-file selection (model_module.py:111-116):
    a directory resolves to model.pt / best_model.pt / model_{n}.pt by
    modelnum; a file path is used as-is."""
    if not os.path.isdir(path):
        return path
    name = ("model.pt" if modelnum == -1
            else "best_model.pt" if modelnum == 999
            else f"model_{modelnum}.pt")
    return os.path.join(path, name)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", type=str, required=True,
                   help="a .pt file, or a reference run directory "
                        "(resolved via --modelnum)")
    p.add_argument("--kind", type=str, default="genzprot",
                   choices=["genzprot", "vqvae"])
    p.add_argument("--modelnum", type=int, default=-1,
                   help="-1=model.pt, 999=best_model.pt, N=model_N.pt "
                        "(reference model_module.py:111-116)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--dec_nconv", type=int, default=4)
    p.add_argument("--embed_dim", type=int, default=36)
    p.add_argument("--vqdim", type=int, default=3,
                   help="N6/K3/K4 all ship vqdim 3 (model_module.py:42)")
    p.add_argument("--codebook_size", type=int, default=4096)
    args = p.parse_args(argv)

    import jax
    import numpy as np
    import optax

    from codlad_tpu.train.checkpoints import CheckpointManager
    from codlad_tpu.train.state import create_train_state

    ckpt_file = resolve_ckpt_file(args.torch_ckpt, args.modelnum)

    if args.kind == "genzprot":
        from codlad_tpu.convert.torch_import import convert_genzprot

        params = convert_genzprot(ckpt_file, num_conv=args.dec_nconv)
        vq_state = None
        extra_cfg = {"train_section": "ivae"}
    else:
        from codlad_tpu.convert.torch_import import (
            convert_vae,
            is_angle_layout,
            load_reference_state_dict,
        )
        from codlad_tpu.models.vq import VQState

        sd = load_reference_state_dict(ckpt_file)
        predict_angle = is_angle_layout(sd)
        params, vq = convert_vae(sd, num_conv=args.dec_nconv,
                                 embed_dim=args.embed_dim, vqdim=args.vqdim)
        vq_state = (VQState(codebook=vq["codebook"],
                            cluster_size=vq["cluster_size"],
                            embed_avg=vq["embed_avg"])
                    if vq is not None else None)
        if vq is not None and vq["codebook"].shape[0] != args.codebook_size:
            print(f"note: checkpoint codebook has "
                  f"{vq['codebook'].shape[0]} codes "
                  f"(--codebook_size {args.codebook_size} overridden)")
            args.codebook_size = int(vq["codebook"].shape[0])
        extra_cfg = {
            "train_section": "vqvae", "vqdim": args.vqdim,
            "codebook_size": args.codebook_size,
            "quantize_type": "vqvae",
            "predict_angle": bool(predict_angle),
        }
        print(f"decoder layout: "
              f"{'IC_Decoder_angle (K3/K4)' if predict_angle else 'IC_Decoder (N6)'}")

    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    print(f"imported {n:,} parameters from {ckpt_file}")

    state = create_train_state(params, optax.identity(), vq_state=vq_state)
    ckpt = CheckpointManager(args.out)
    ckpt.save_config({
        "embed_dim": args.embed_dim, "n_rbf": 15,
        "cg_cutoff": 21.0, "atom_cutoff": 9.0, "enc_nconv": 3,
        "dec_nconv": args.dec_nconv, "imported_from": ckpt_file,
        **extra_cfg,
    })
    ckpt.save(state, "last")
    print(f"wrote {args.out}/last")


if __name__ == "__main__":
    main()
