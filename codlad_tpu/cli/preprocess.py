"""Preprocessing CLI: PDB structures -> featurized .npz shards.

Equivalent of `extract_features.py --process_data` (reference:
extract_features.py:93-178): reads per-protein PDB files (multi-MODEL
ensembles; one shard per protein), featurizes every frame, pads to a
per-protein PadSpec, and records a success/failure manifest.

Usage:
  python -m codlad_tpu.cli.preprocess --pdb_dir DIR --out_dir OUT \
      [--split_file ids.txt] [--max_frames N] [--synthetic N_PROT N_RES N_FRAMES]

`--synthetic` generates the dataset-free substrate instead of reading PDBs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from codlad_tpu.data.featurize import FeaturizeConfig
from codlad_tpu.data.pdb import parse_pdb
from codlad_tpu.data.shards import preprocess_structure, save_protein_shard
from codlad_tpu.data.synthetic import synthetic_examples


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pdb_dir", type=str, default=None)
    p.add_argument("--split_file", type=str, default=None,
                   help="text file of protein ids (one per line)")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--xtc_dir", type=str, default=None,
                   help="directory of Atlas-style xtc replicas; each "
                        "protein id needs {id}.pdb topology in --pdb_dir "
                        "and {id}*.xtc here (reference "
                        "protein_module.py:898)")
    p.add_argument("--stride", type=int, default=100,
                   help="xtc frame stride (reference Atlas train "
                        "convention: 100; test: 10000)")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--atom_cutoff", type=float, default=9.0)
    p.add_argument("--cg_cutoff", type=float, default=21.0)
    p.add_argument("--edgeorder", type=int, default=2)
    p.add_argument("--synthetic", type=int, nargs=3, default=None,
                   metavar=("N_PROT", "N_RES", "N_FRAMES"))
    p.add_argument("--structured", action="store_true",
                   help="synthetic mode: learnable rotamer-mode generator "
                        "(for convergence studies) instead of i.i.d. "
                        "torsions")
    p.add_argument("--res_range", type=int, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="synthetic mode: sample each protein's length "
                        "uniformly from [LO, HI] instead of the fixed N_RES")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    cfg = FeaturizeConfig(atom_cutoff=args.atom_cutoff,
                          cg_cutoff=args.cg_cutoff,
                          bond_order=args.edgeorder)
    success, failed = [], []

    if args.synthetic:
        n_prot, n_res, n_frames = args.synthetic
        lens_rng = np.random.default_rng(args.seed + 991)
        for i in range(n_prot):
            ni = (int(lens_rng.integers(args.res_range[0],
                                        args.res_range[1] + 1))
                  if args.res_range else n_res)
            exs = synthetic_examples(n_frames, ni, seed=args.seed + i,
                                     cfg=cfg, prot_idx=i,
                                     structured=args.structured)
            save_protein_shard(os.path.join(args.out_dir, f"prot_{i:04d}.npz"), exs)
            success.append(f"prot_{i:04d}")
            print(f"[{i + 1}/{n_prot}] synthetic prot_{i:04d}: "
                  f"{n_frames} frames, {ni} residues"
                  f"{' (structured)' if args.structured else ''}", flush=True)
    else:
        if args.pdb_dir is None:
            p.error("--pdb_dir or --synthetic required")
        if args.split_file:
            with open(args.split_file) as f:
                ids = [ln.strip() for ln in f if ln.strip()]
            files = [os.path.join(args.pdb_dir, f"{i}.pdb") for i in ids]
        else:
            files = sorted(
                os.path.join(args.pdb_dir, f) for f in os.listdir(args.pdb_dir)
                if f.endswith((".pdb", ".pdb.gz")))
        for i, path in enumerate(files):
            name = os.path.basename(path).split(".")[0]
            try:
                if args.xtc_dir:
                    import glob

                    from codlad_tpu.data.pdb import load_xtc_ensemble
                    xtcs = sorted(glob.glob(
                        os.path.join(args.xtc_dir, f"{name}*.xtc")))
                    if not xtcs:
                        raise FileNotFoundError(
                            f"no xtc replicas for {name} in {args.xtc_dir}")
                    struct = load_xtc_ensemble(path, xtcs, stride=args.stride,
                                               max_frames=args.max_frames)
                else:
                    struct = parse_pdb(path)
                exs = preprocess_structure(struct, prot_idx=i, cfg=cfg,
                                           max_frames=args.max_frames)
                save_protein_shard(os.path.join(args.out_dir, f"{name}.npz"), exs)
                success.append(name)
                print(f"[{i + 1}/{len(files)}] {name}: {len(exs)} frames ok",
                      flush=True)
            except Exception as e:  # per-protein failures are tolerated
                failed.append({"name": name, "error": f"{type(e).__name__}: {e}"})
                print(f"[{i + 1}/{len(files)}] {name}: FAILED {e}",
                      file=sys.stderr, flush=True)

    if success:
        from codlad_tpu.data.shards import align_shard_buckets
        merged = align_shard_buckets(args.out_dir)
        print(f"bucket alignment: {len(merged)} compilation bucket(s) "
              f"for {len(success)} protein(s)")

    with open(os.path.join(args.out_dir, "manifest.json"), "w") as f:
        json.dump({"success": success, "failed": failed,
                   "config": vars(args)}, f, indent=2, default=str)
    print(f"done: {len(success)} ok, {len(failed)} failed")


if __name__ == "__main__":
    main()
