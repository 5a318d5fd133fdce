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


def _savez_fast(path, **arrays):
    """np.savez_compressed with deflate level 1: padded shards are mostly
    zeros, where level 1 compresses nearly as well as the default level 6
    but ~6x faster — on this 1-CPU build host the default made shard
    alignment of a 32k-frame corpus a ~50-minute zlib run."""
    import zipfile

    tmp = os.fspath(path) + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED, compresslevel=1) as zf:
        for k, v in arrays.items():
            with zf.open(f"{k}.npy", "w", force_zip64=True) as f:
                np.lib.format.write_array(f, np.asanyarray(v),
                                          allow_pickle=False)
    os.replace(tmp, path)


def save_protein_shard(path, examples, spec: B.PadSpec | None = None):
    """Featurized frames of ONE protein -> a padded .npz shard.

    The spec is snapped onto the global bucket lattice (batch.quantize_spec)
    so shards of different proteins share XLA compilation buckets."""
    spec = spec or B.quantize_spec(B.spec_for(examples))
    stacked = B.collate(examples, spec)
    _savez_fast(path, __spec__=np.array(json.dumps(dataclasses.asdict(spec))),
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


def repad_shard_data(data, old_spec: B.PadSpec, new_spec: B.PadSpec):
    """Grow a shard's padded arrays from old_spec to new_spec (same or
    larger extents; padding rows carry False masks / zeros)."""
    out = {}
    grow_L = new_spec.L - old_spec.L
    for k, v in data.items():
        if k in B.EDGE_KEYS or (k.endswith("_mask") and k[:-5] in B.EDGE_KEYS):
            key = k if k in B.EDGE_KEYS else k[:-5]
            grow = new_spec.edge_capacity(key) - old_spec.edge_capacity(key)
            pad = [(0, 0)] * v.ndim
            pad[1] = (0, grow)
            out[k] = np.pad(v, pad)
        elif v.ndim >= 2 and v.shape[1] in (old_spec.L, old_spec.L + 2):
            pad = [(0, 0)] * v.ndim
            pad[1] = (0, grow_L)
            out[k] = np.pad(v, pad)
        else:
            out[k] = v
    return out


def align_shard_buckets(directory):
    """Unify PadSpecs across a shard directory so proteins share XLA
    compilation buckets: within each length bucket, every shard is re-padded
    to the per-L upper envelope of edge capacities.  Round 1 compiled one
    program per protein (first 89 s, ~13 s per new shape); after alignment
    an eval over N proteins compiles once per distinct L bucket."""
    files = sorted(f for f in os.listdir(directory) if f.endswith(".npz"))
    by_L = {}
    specs = {}
    for f in files:
        spec, _ = load_protein_shard(os.path.join(directory, f))
        specs[f] = spec
        by_L.setdefault(spec.L, []).append(f)
    merged = {L: B.merge_specs(specs[f] for f in group)
              for L, group in by_L.items()}
    for f in files:
        new_spec = merged[specs[f].L]
        if new_spec == specs[f]:
            continue
        path = os.path.join(directory, f)
        _, data = load_protein_shard(path)
        data = repad_shard_data(data, specs[f], new_spec)
        _savez_fast(
            path, __spec__=np.array(json.dumps(dataclasses.asdict(new_spec))),
            **data)
    return merged


def iter_padded_batches(data, batch_size, idx, n_valid=None):
    """Yield constant-size batches covering every index in `idx[:n_valid]`
    exactly once.  Partial batches are padded back to `batch_size` by
    repeating the first selected frame with every `*mask` key zeroed, so
    masked losses/metrics ignore the padding and the batch shape stays
    compile-stable (reference DataLoaders keep partial batches,
    drop_last=False — train_vqvae.py:58-66).

    n_valid (default: all of idx): rows of `idx` at positions >= n_valid
    are treated as padding too and get their masks zeroed — used by
    per-host data striping, where stripes are pre-padded to a common
    length so every host yields the same batch count."""
    if n_valid is None:
        n_valid = idx.size
    for s in range(0, idx.size, batch_size):
        sel = idx[s:s + batch_size]
        valid = min(max(n_valid - s, 0), sel.size)
        if sel.size < batch_size:
            fill = sel[0] if sel.size else idx[0]
            sel = np.concatenate(
                [sel, np.full(batch_size - sel.size, fill, dtype=idx.dtype)])
        out = {k: v[sel] for k, v in data.items()}
        if valid < batch_size:
            for k, v in out.items():
                if k.endswith("mask"):
                    v = v.copy()
                    v[valid:] = False if v.dtype == bool else 0
                    out[k] = v
        yield out


def class_shuffle_order(labels, rng):
    """Class-contiguous shuffled index order: shuffle indices WITHIN each
    label, shuffle the label order, concatenate (the reference's
    ShuffleSampler, utils/dataset_module.py:351-380 — unused on its main
    path but part of the component surface).  The streaming loaders below
    realize the same semantics implicitly (shards shuffle internally,
    shard order shuffles, batches never straddle a shard in ShardDataset);
    this explicit form covers consumers holding a flat indexable dataset.

    labels: int array [N] (e.g. prot_idx per sample).  rng: numpy
    Generator.  Returns an int array permutation of arange(N).
    """
    labels = np.asarray(labels)
    out = []
    uniq = list(np.unique(labels))
    rng.shuffle(uniq)
    for lab in uniq:
        idx = np.flatnonzero(labels == lab)
        rng.shuffle(idx)
        out.append(idx)
    return np.concatenate(out) if out else np.zeros(0, np.int64)


class ShardDataset:
    """Streams frame batches from a directory of per-protein shards.

    Frames of one shard share a PadSpec; batches never mix shards (the
    reference trains with batch_size 4 over per-protein pickles the same
    way, train_vqvae.py:58-66).  Shard order shuffles per epoch; frames
    shuffle within a shard (reference dataset_module.py:72-92).  Every
    frame appears exactly once per epoch: the tail batch is padded with
    mask-zeroed duplicates instead of being dropped.

    For batches that MIX proteins (the reference MultiPKLDataset pool
    straddles shard boundaries), see MixedShardDataset.
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
            yield from iter_padded_batches(data, self.batch_size, idx)

    def epoch_batches(self):
        total = 0
        for fname in self.files:
            _, data = load_protein_shard(os.path.join(self.directory, fname))
            n = data["res_type"].shape[0]
            total += -(-n // self.batch_size)
        return total


class MixedShardDataset:
    """Streams frame batches MIXING proteins within a compilation bucket.

    The reference's MultiPKLDataset keeps a bounded in-RAM pool that
    straddles per-protein pickle boundaries, so a batch can hold frames of
    different proteins (reference: utils/dataset_module.py:26-117, pool
    max 10k halved on overflow; utils/train_module.py:269-311 has the
    explicit multi-protein batch path).  Here: shards are grouped by their
    PadSpec (after data.shards.align_shard_buckets, all shards of an L
    bucket share one spec, so their padded arrays concatenate directly),
    and within each group a bounded frame pool is filled from shuffled
    shards, shuffled, and drained as full batches — cross-protein by
    construction whenever a bucket holds >1 protein.  Every frame appears
    exactly once per epoch; each group's tail batch is mask-padded.
    """

    def __init__(self, directory, batch_size, seed=0, shuffle=True,
                 pool_frames=4096):
        self.directory = directory
        self.files = sorted(
            f for f in os.listdir(directory) if f.endswith(".npz"))
        if not self.files:
            raise FileNotFoundError(f"no .npz shards in {directory}")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.pool_frames = max(pool_frames, batch_size)
        self._rng = np.random.default_rng(seed)
        self._groups = {}
        for f in self.files:
            spec, _ = load_protein_shard(os.path.join(directory, f))
            key = json.dumps(dataclasses.asdict(spec), sort_keys=True)
            self._groups.setdefault(key, []).append(f)

    def _drain(self, chunks, count, final):
        """Emit batches from the pooled chunks; return the remainder."""
        if count == 0:
            return [], 0
        data = {k: np.concatenate([c[k] for c in chunks])
                for k in chunks[0]}
        idx = np.arange(count)
        if self.shuffle:
            self._rng.shuffle(idx)
        n_emit = count if final else (count // self.batch_size) * self.batch_size
        if n_emit:
            yield from iter_padded_batches(data, self.batch_size, idx[:n_emit])
        rest = idx[n_emit:]
        if rest.size:
            return [{k: v[rest] for k, v in data.items()}], rest.size
        return [], 0

    def __iter__(self):
        group_keys = list(self._groups)
        if self.shuffle:
            self._rng.shuffle(group_keys)
        for key in group_keys:
            files = list(self._groups[key])
            if self.shuffle:
                self._rng.shuffle(files)
            chunks, count = [], 0
            for fname in files:
                _, data = load_protein_shard(
                    os.path.join(self.directory, fname))
                chunks.append(data)
                count += data["res_type"].shape[0]
                if count >= self.pool_frames:
                    gen = self._drain(chunks, count, final=False)
                    try:
                        while True:
                            yield next(gen)
                    except StopIteration as stop:
                        chunks, count = stop.value
            gen = self._drain(chunks, count, final=True)
            try:
                while True:
                    yield next(gen)
            except StopIteration:
                pass

    def epoch_batches(self):
        total = 0
        for key, files in self._groups.items():
            n = 0
            for fname in files:
                _, data = load_protein_shard(
                    os.path.join(self.directory, fname))
                n += data["res_type"].shape[0]
            total += -(-n // self.batch_size)
        return total
