"""Dataset shards: preprocessing output + streaming loaders.

Replaces the reference's per-protein pickle shards + MultiPKLDataset pool
(reference: utils/dataset_module.py:26-141, extract_features.py:93-178)
with fixed-shape .npz shards, one per protein, each holding every
featurized frame stacked.  Loading streams shard-by-shard with file-order
shuffling per epoch and groups frames into PadSpec buckets so each bucket
shape compiles once.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from codlad_tpu.data import batch as B
from codlad_tpu.data.featurize import FeaturizeConfig, featurize_frame

_STACK_KEYS = None  # all example keys are stackable per protein after padding


def save_protein_shard(path, examples, spec: B.PadSpec | None = None):
    """Featurized frames of ONE protein -> a padded .npz shard."""
    spec = spec or B.spec_for(examples)
    stacked = B.collate(examples, spec)
    np.savez_compressed(path, __spec__=np.array(json.dumps(dataclasses.asdict(spec))),
                        **stacked)
    return spec


def load_protein_shard(path):
    z = np.load(path, allow_pickle=False)
    spec = B.PadSpec(**json.loads(str(z["__spec__"])))
    data = {k: z[k] for k in z.files if k != "__spec__"}
    return spec, data


def preprocess_structure(struct, prot_idx=0, cfg: FeaturizeConfig | None = None,
                         max_frames=None):
    """Parsed structure dict (see data/pdb.parse_pdb) -> featurized examples."""
    frames = struct["cg_xyz_og"].shape[0]
    if max_frames is not None:
        frames = min(frames, max_frames)
    examples = []
    for f in range(frames):
        examples.append(featurize_frame(
            struct["res_type_og"], struct["chain_id_og"],
            struct["cg_xyz_og"][f], struct["xyz14"][f], cfg=cfg,
            prot_idx=prot_idx))
    return examples


class ShardDataset:
    """Streams frame batches from a directory of per-protein shards.

    Frames of one shard share a PadSpec; batches never mix shards (the
    reference trains with batch_size 4 over per-protein pickles the same
    way, train_vqvae.py:58-66).  Shard order shuffles per epoch; frames
    shuffle within a shard (reference dataset_module.py:72-92).
    """

    def __init__(self, directory, batch_size, seed=0, shuffle=True):
        self.directory = directory
        self.files = sorted(
            f for f in os.listdir(directory) if f.endswith(".npz"))
        if not self.files:
            raise FileNotFoundError(f"no .npz shards in {directory}")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        files = list(self.files)
        if self.shuffle:
            self._rng.shuffle(files)
        for fname in files:
            spec, data = load_protein_shard(os.path.join(self.directory, fname))
            n = data["res_type"].shape[0]
            idx = np.arange(n)
            if self.shuffle:
                self._rng.shuffle(idx)
            bs = min(self.batch_size, n)
            for s in range(0, n - bs + 1, bs):
                sel = idx[s:s + bs]
                yield {k: v[sel] for k, v in data.items()}

    def epoch_batches(self):
        total = 0
        for fname in self.files:
            _, data = load_protein_shard(os.path.join(self.directory, fname))
            total += data["res_type"].shape[0] // self.batch_size
        return total
