"""Per-channel latent normalization statistics.

Equivalent of the reference's miu_and_sigma .pt files + `get_norm_feature`
(reference: utils/dataset_module.py:230-256; extract_features.py:280-285):
Stage-2 trains on standardized latents, and sampling de-standardizes before
the VQ snap + decode.  Stats are stored as .npz next to the features.
"""

from __future__ import annotations

import os

import numpy as np


def compute_stats(latents_list, masks_list):
    """Channel-wise mean/std over all valid residues of all latent arrays."""
    vals = np.concatenate([
        np.asarray(x)[np.asarray(m, dtype=bool)] for x, m in zip(latents_list, masks_list)
    ], axis=0)
    return vals.mean(0), vals.std(0)


def save_stats(path, name, mean, std):
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, f"{name}_stats.npz"), mean=mean, std=std)


def load_stats(path, name):
    """Channel stats by name: our `{name}_stats.npz`, falling back to the
    reference's published torch layout `{dataname}_{type}_x_{mean,std}.pt`
    for names like 'PED_N6' (reference utils/dataset_module.py:230-256) —
    so `--stats_name PED_N6 --stats_dir <...>/datasets/miu_and_sigma`
    consumes the shipped assets with no conversion step."""
    npz = os.path.join(path, f"{name}_stats.npz")
    if os.path.exists(npz):
        z = np.load(npz)
        return z["mean"], z["std"]
    if "_" in name:
        dataname, ftype = name.rsplit("_", 1)
        if os.path.exists(os.path.join(path,
                                       f"{dataname}_{ftype}_x_mean.pt")):
            return load_reference_stats(path, ftype, dataname)
    raise FileNotFoundError(
        f"no stats named '{name}' under {path} (looked for {name}_stats.npz "
        f"and the reference .pt pair)")


def normalize(x, mean, std, norm_in=True):
    """norm_in=True standardizes; False de-standardizes (reference
    get_norm_feature semantics)."""
    if norm_in:
        return (x - mean) / std
    return x * std + mean


# dataname remap used by the reference for the IDRome test set
# (reference utils/dataset_module.py:239-246)
_IDROME_REMAP = {"N6": "PED", "K3": "PDB", "K4": "Atlas"}


def _load_pt_tensor(path):
    """Load a single tensor from a torch-zip .pt file WITHOUT torch.

    torch.save (>=1.6) writes a zip holding `data.pkl` (a pickle whose
    tensors are persistent-id references) plus raw little-endian storage
    blobs under `data/<key>`.  A tiny custom Unpickler reconstructs plain
    numpy arrays from that — enough for the stats files, which hold one
    flat float tensor each."""
    import pickle
    import zipfile

    _DTYPES = {
        "FloatStorage": np.float32, "DoubleStorage": np.float64,
        "HalfStorage": np.float16, "LongStorage": np.int64,
        "IntStorage": np.int32, "ShortStorage": np.int16,
        "CharStorage": np.int8, "ByteStorage": np.uint8,
        "BoolStorage": np.bool_, "BFloat16Storage": None,
    }

    with zipfile.ZipFile(path) as zf:
        pkl_name = next(n for n in zf.namelist() if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]

        class _Stub:
            def __init__(self, name):
                self.name = name

        def _rebuild(storage, offset, size, stride, *_):
            arr, dtype = storage
            n = int(np.prod(size)) if size else 1
            flat = arr[offset: offset + n]
            if not size:
                return flat.reshape(())
            # stats tensors are contiguous; honor stride via as_strided
            itemsize = flat.dtype.itemsize
            return np.lib.stride_tricks.as_strided(
                flat, shape=tuple(size),
                strides=tuple(s * itemsize for s in stride)).copy()

        class _Unpickler(pickle.Unpickler):
            def find_class(self, module, name):
                if name == "_rebuild_tensor_v2":
                    return _rebuild
                if module == "torch" and name.endswith("Storage"):
                    return _Stub(name)
                if module == "collections":
                    return super().find_class(module, name)
                return _Stub(name)

            def persistent_load(self, pid):
                kind, cls, key, _loc, numel = pid[:5]
                assert kind == "storage", kind
                dtype = _DTYPES.get(getattr(cls, "name", ""), np.float32)
                if dtype is None:
                    raw = zf.read(f"{prefix}data/{key}")
                    u16 = np.frombuffer(raw, dtype=np.uint16)
                    return (np.left_shift(u16.astype(np.uint32), 16)
                            .view(np.float32), np.float32)  # bf16 -> f32
                raw = zf.read(f"{prefix}data/{key}")
                return np.frombuffer(raw, dtype=dtype).copy(), dtype

        with zf.open(pkl_name) as f:
            return _Unpickler(f).load()


def load_reference_stats(miu_sigma_dir, feature_type="N6", dataname="PED"):
    """Load the reference's torch-format channel stats
    (datasets/miu_and_sigma/{dataname}_{type}_x_{mean,std}.pt) — drop-in
    compatibility with published normalization constants.  Uses torch when
    available, else the built-in torch-zip reader (torch-less deployments
    keep the parity bridge)."""
    if dataname == "IDRome_test_7":
        dataname = _IDROME_REMAP.get(feature_type, dataname)
    mpath = os.path.join(miu_sigma_dir, f"{dataname}_{feature_type}_x_mean.pt")
    spath = os.path.join(miu_sigma_dir, f"{dataname}_{feature_type}_x_std.pt")
    try:
        import torch
        mean = torch.load(mpath, map_location="cpu", weights_only=True)
        std = torch.load(spath, map_location="cpu", weights_only=True)
    except ImportError:
        mean = _load_pt_tensor(mpath)
        std = _load_pt_tensor(spath)
    return np.asarray(mean, dtype=np.float32), np.asarray(std, dtype=np.float32)
