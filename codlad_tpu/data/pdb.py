"""Minimal PDB reader/writer for heavy-atom protein structures.

The reference delegates IO/topology to mdtraj (reference:
utils/protein_module.py:878-918); this environment has no mdtraj, so a
small self-contained parser covers the framework's needs: ATOM records of
the 22 supported residue types, multi-MODEL ensembles, multiple chains,
hydrogens dropped.  Output into the canonical atom14 layout used everywhere
else, plus a writer for exporting generated ensembles as multi-MODEL PDB
(the reference's xtc export requires mdtraj and is gated off without it).
"""

from __future__ import annotations

import gzip

import numpy as np

from codlad_tpu.geometry import residues as R


class PDBParseError(ValueError):
    pass


def _open(path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path)


def parse_pdb(path, model_index=None):
    """Parse a PDB file into frames of the atom14 layout.

    Returns dict with:
      res_type_og [R] int32, chain_id_og [R] int32,
      cg_xyz_og [F, R, 3] f32, xyz14 [F, R-2, 14, 3] f32,
      atom14_mask [R-2, 14] bool (atoms actually present in the file).
    """
    models = []   # list of dict (chain, resseq) -> {atom_name: xyz}
    current = {}
    order = []    # residue keys in file order
    res_names = {}
    n_models = 0

    def flush():
        nonlocal current, n_models
        if current:
            models.append(current)
            n_models += 1
            current = {}

    with _open(path) as f:
        for line in f:
            rec = line[:6]
            if rec == "MODEL ":
                flush()
            elif rec in ("ATOM  ", "HETATM"):
                resname = line[17:20].strip()
                if resname not in R.THREE_TO_ONE:
                    continue
                name = line[12:16].strip()
                altloc = line[16]
                if altloc not in (" ", "A"):
                    continue
                element = (line[76:78].strip() or name[0]).upper()
                if element == "H" or name.startswith("H") and element == "":
                    continue
                if element == "H" or element == "D":
                    continue
                chain = line[21]
                resseq = int(line[22:26])
                icode = line[26]
                key = (chain, resseq, icode)
                if key not in current:
                    current[key] = {}
                    if n_models == 0 and key not in res_names:
                        order.append(key)
                        res_names[key] = resname
                xyz = (float(line[30:38]), float(line[38:46]), float(line[46:54]))
                current[key][name] = xyz
            elif rec == "ENDMDL":
                flush()
    flush()

    if not models or not order:
        raise PDBParseError(f"no protein atoms parsed from {path}")
    if model_index is not None:
        models = [models[model_index]]

    # keep only residues present with a CA in the first model
    order = [k for k in order if "CA" in models[0].get(k, {})]
    n_res = len(order)
    if n_res < 3:
        raise PDBParseError(f"need >= 3 residues, got {n_res}")

    chain_ids_raw = [k[0] for k in order]
    chain_map = {c: i for i, c in enumerate(dict.fromkeys(chain_ids_raw))}
    chain_id_og = np.array([chain_map[c] for c in chain_ids_raw], np.int32)
    res_type_og = np.array([R.restype_index(res_names[k]) for k in order], np.int32)

    F = len(models)
    cg = np.zeros((F, n_res, 3), np.float32)
    xyz14 = np.zeros((F, n_res - 2, R.MAX_ATOMS, 3), np.float32)
    mask14 = np.zeros((n_res - 2, R.MAX_ATOMS), bool)

    for fidx, model in enumerate(models):
        for i, key in enumerate(order):
            atoms = model.get(key, {})
            if "CA" in atoms:
                cg[fidx, i] = atoms["CA"]
            if 1 <= i <= n_res - 2:
                rt = res_type_og[i]
                for slot in range(int(R.RES_NATOMS[rt])):
                    nm = R.ATOM14_NAMES[rt, slot]
                    if nm in atoms:
                        xyz14[fidx, i - 1, slot] = atoms[nm]
                        if fidx == 0:
                            mask14[i - 1, slot] = True

    return {
        "res_type_og": res_type_og,
        "chain_id_og": chain_id_og,
        "cg_xyz_og": cg,
        "xyz14": xyz14,
        "atom14_mask": mask14,
    }


def write_pdb(path, res_type_og, chain_id_og, xyz14_frames, cg_xyz_og=None):
    """Write modeled residues (atom14 frames) as a multi-MODEL PDB.

    xyz14_frames: [F, L, 14, 3] for the L = R-2 modeled residues.
    """
    res_type = res_type_og[1:-1]
    chain_id = chain_id_og[1:-1]
    L = len(res_type)
    frames = np.asarray(xyz14_frames)
    chain_letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"

    with open(path, "w") as f:
        for fi, frame in enumerate(frames):
            f.write(f"MODEL     {fi + 1:4d}\n")
            serial = 1
            for i in range(L):
                rt = int(res_type[i])
                three = R.IDX_TO_THREE[rt]
                for slot in range(int(R.RES_NATOMS[rt])):
                    nm = R.ATOM14_NAMES[rt, slot]
                    x, y, z = frame[i, slot]
                    elem = nm[0] if not nm.startswith("SE") else "SE"
                    # standard columns: name 13-16, altLoc 17, resName 18-20,
                    # chain 22, resSeq 23-26, iCode 27, x from 31 (1-indexed)
                    f.write(
                        f"ATOM  {serial:5d} {nm:<4s} {three:>3s} "
                        f"{chain_letters[int(chain_id[i]) % 26]}{i + 2:4d}    "
                        f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00"
                        f"          {elem:>2s}\n")
                    serial += 1
            f.write("ENDMDL\n")
        f.write("END\n")
