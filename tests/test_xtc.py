"""XTC codec (data/xtc.py + native 3dfcoord kernels).

The reference reads/writes xtc via mdtraj's compiled xdrfile (reference:
utils/protein_module.py:898, utils/dataset_module.py:148-160,
test.py:787-803); these tests pin our self-contained reimplementation:
round-trips at the precision quantum, native/pure-Python codec agreement,
run-length and smallidx-adaptation branches, strided payload skipping.
"""

import numpy as np
import pytest

from codlad_tpu import native
from codlad_tpu.data import xtc

PREC = 1000.0
TOL = 0.5 / PREC + 1e-5


def _chain(rng, n, step=0.05):
    return np.cumsum(rng.normal(0, step, size=(n, 3)), 0).astype(np.float32)


def test_roundtrip_protein_scale(tmp_path):
    rng = np.random.default_rng(0)
    T, N = 6, 500
    base = _chain(rng, N)
    frames = np.stack([base + rng.normal(0, 0.02, (N, 3)).astype(np.float32)
                       for _ in range(T)])
    path = tmp_path / "traj.xtc"
    xtc.write_xtc(path, frames, time=np.arange(T) * 2.0, precision=PREC)
    out = xtc.read_xtc(path)
    assert out["xyz"].shape == (T, N, 3)
    assert np.abs(out["xyz"] - frames).max() <= TOL
    np.testing.assert_allclose(out["time"], np.arange(T) * 2.0)
    np.testing.assert_array_equal(out["step"], np.arange(T))


def test_stride_skips_without_decoding(tmp_path):
    rng = np.random.default_rng(1)
    frames = np.stack([_chain(rng, 40) for _ in range(10)])
    path = tmp_path / "traj.xtc"
    xtc.write_xtc(path, frames)
    full = xtc.read_xtc(path)
    strided = xtc.read_xtc(path, stride=3)
    assert strided["xyz"].shape[0] == 4  # frames 0,3,6,9
    np.testing.assert_allclose(strided["xyz"], full["xyz"][::3])
    capped = xtc.read_xtc(path, stride=3, max_frames=2)
    np.testing.assert_allclose(capped["xyz"], full["xyz"][::3][:2])


def test_run_length_water_packing():
    """Tight atom clusters force the encoder's run/swap path; decode must
    invert it exactly (the trickiest branch of the format)."""
    rng = np.random.default_rng(2)
    centers = _chain(rng, 50, step=0.3)
    # water-like triplets: 3 atoms within ~0.01 nm of each center
    pts = (centers[:, None, :] +
           rng.normal(0, 0.004, (50, 3, 3))).reshape(-1, 3).astype(np.float32)
    enc = native.xtc_encode(pts, PREC)
    assert enc is not None
    data, mi, ma, si = enc
    # lazy (no-run) encoding must be materially larger -> runs were used
    lazy, *_ = xtc._encode_frame_py(pts, PREC)
    assert len(data) < 0.8 * len(lazy)
    out = native.xtc_decode(data, pts.shape[0], mi, ma, si, PREC)
    assert np.abs(out - pts).max() <= TOL
    # pure-Python decoder agrees with the native one
    py = xtc._decode_frame_py(data, pts.shape[0], mi, ma, si, PREC)
    np.testing.assert_allclose(py, out, atol=2e-6)


def test_smallidx_adaptation():
    """Mixed scales (close runs then jumps) drive is_smaller transitions."""
    rng = np.random.default_rng(3)
    segs = []
    pos = np.zeros(3, np.float32)
    for s in range(12):
        step = 0.002 if s % 2 == 0 else 0.5
        seg = pos + np.cumsum(rng.normal(0, step, (30, 3)), 0)
        segs.append(seg.astype(np.float32))
        pos = seg[-1]
    pts = np.concatenate(segs)
    data, mi, ma, si = native.xtc_encode(pts, PREC)
    out = native.xtc_decode(data, pts.shape[0], mi, ma, si, PREC)
    assert np.abs(out - pts).max() <= TOL
    py = xtc._decode_frame_py(data, pts.shape[0], mi, ma, si, PREC)
    np.testing.assert_allclose(py, out, atol=2e-6)


def test_python_lazy_encoder_decodes_everywhere():
    rng = np.random.default_rng(4)
    pts = _chain(rng, 64)
    data, mi, ma, si = xtc._encode_frame_py(pts, PREC)
    nat = native.xtc_decode(data, 64, mi, ma, si, PREC)
    py = xtc._decode_frame_py(data, 64, mi, ma, si, PREC)
    assert np.abs(nat - pts).max() <= TOL
    np.testing.assert_allclose(py, nat, atol=2e-6)


def test_small_system_uncompressed(tmp_path):
    rng = np.random.default_rng(5)
    frames = rng.normal(size=(3, 7, 3)).astype(np.float32)
    path = tmp_path / "small.xtc"
    xtc.write_xtc(path, frames)
    out = xtc.read_xtc(path)
    np.testing.assert_allclose(out["xyz"], frames, atol=1e-6)


def test_bad_magic_raises(tmp_path):
    path = tmp_path / "bad.xtc"
    path.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        xtc.read_xtc(path)


def test_load_xtc_ensemble_matches_pdb(tmp_path):
    """Atlas-style ingestion: topology PDB + xtc replicas reproduces the
    multi-MODEL PDB path exactly (up to the xtc precision quantum)."""
    from codlad_tpu.data.pdb import load_xtc_ensemble, parse_pdb, write_pdb
    from codlad_tpu.data.synthetic import random_protein

    rng = np.random.default_rng(7)
    res_type_og, chain_id_og, cg, xyz14 = random_protein(rng, 14)
    frames = np.stack([xyz14 + rng.normal(0, 0.3, xyz14.shape).astype(np.float32)
                       for _ in range(6)])
    pdb_path = str(tmp_path / "prot.pdb")
    write_pdb(pdb_path, res_type_og, chain_id_og, frames)
    ref = parse_pdb(pdb_path)

    # xtc streams follow the topology's file atom order (nm)
    models, order, res_names, file_atoms = parse_pdb(pdb_path,
                                                     return_topology=True)
    flat = np.stack([
        np.array([m[key][name] for (key, name, keep) in file_atoms],
                 np.float32)
        for m in models]) / 10.0
    xtc.write_xtc(tmp_path / "prot_R1.xtc", flat, precision=10000.0)
    xtc.write_xtc(tmp_path / "prot_R2.xtc", flat[::2], precision=10000.0)

    out = load_xtc_ensemble(pdb_path,
                            [tmp_path / "prot_R1.xtc",
                             tmp_path / "prot_R2.xtc"], stride=1)
    assert out["xyz14"].shape[0] == 6 + 3
    np.testing.assert_array_equal(out["res_type_og"], ref["res_type_og"])
    np.testing.assert_allclose(out["xyz14"][:6], ref["xyz14"], atol=2e-3)
    np.testing.assert_allclose(out["cg_xyz_og"][6:], ref["cg_xyz_og"][::2],
                               atol=2e-3)

    strided = load_xtc_ensemble(pdb_path, [tmp_path / "prot_R1.xtc"], stride=2)
    np.testing.assert_allclose(strided["xyz14"], ref["xyz14"][::2], atol=2e-3)
