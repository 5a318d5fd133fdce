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
    z = np.load(os.path.join(path, f"{name}_stats.npz"))
    return z["mean"], z["std"]


def normalize(x, mean, std, norm_in=True):
    """norm_in=True standardizes; False de-standardizes (reference
    get_norm_feature semantics)."""
    if norm_in:
        return (x - mean) / std
    return x * std + mean


# dataname remap used by the reference for the IDRome test set
# (reference utils/dataset_module.py:239-246)
_IDROME_REMAP = {"N6": "PED", "K3": "PDB", "K4": "Atlas"}


def load_reference_stats(miu_sigma_dir, feature_type="N6", dataname="PED"):
    """Load the reference's torch-format channel stats
    (datasets/miu_and_sigma/{dataname}_{type}_x_{mean,std}.pt) — drop-in
    compatibility with published normalization constants."""
    import torch

    if dataname == "IDRome_test_7":
        dataname = _IDROME_REMAP.get(feature_type, dataname)
    mean = torch.load(os.path.join(miu_sigma_dir, f"{dataname}_{feature_type}_x_mean.pt"),
                      map_location="cpu", weights_only=True)
    std = torch.load(os.path.join(miu_sigma_dir, f"{dataname}_{feature_type}_x_std.pt"),
                     map_location="cpu", weights_only=True)
    return np.asarray(mean, dtype=np.float32), np.asarray(std, dtype=np.float32)
