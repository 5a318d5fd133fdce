"""Generate (and, where possible, externally verify) the pinned e3nn
Wigner-3j fixtures.

The framework reconstructs e3nn's conventions from first principles
(codlad_tpu/convert/e3nn_basis.py — SU(2) Clebsch-Gordan -> real-basis
w3j; reference consumer: models/gcn_nn.py:181-219).  This script freezes
the 15 w3j tensors for all valid (l1, l2, l3) with l <= 2 into
tests/fixtures/e3nn_w3j.npz so any drift in the reconstruction is caught
by tests/test_convert.py, and — on any machine where e3nn IS installable
(it is not in this container) — diffs the reconstruction against e3nn
itself, turning the internal-consistency argument into a one-command
external check:

    python scripts/gen_e3nn_fixtures.py          # regenerate + verify
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from codlad_tpu.convert.e3nn_basis import e3nn_w3j  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "e3nn_w3j.npz")


def all_paths(lmax=2):
    for l1 in range(lmax + 1):
        for l2 in range(lmax + 1):
            for l3 in range(abs(l1 - l2), min(l1 + l2, lmax) + 1):
                yield l1, l2, l3


def main():
    tensors = {f"w3j_{l1}_{l2}_{l3}": np.asarray(e3nn_w3j(l1, l2, l3),
                                                 np.float64)
               for l1, l2, l3 in all_paths()}
    assert len(tensors) == 15, len(tensors)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, **tensors)
    print(f"wrote {len(tensors)} w3j tensors -> {os.path.abspath(OUT)}")

    try:
        from e3nn import o3  # only on machines that have e3nn
    except ImportError:
        print("e3nn not installed here: fixtures pinned from the "
              "first-principles reconstruction (already verified "
              "internally by tests/test_e3nn_basis.py).")
        return 0

    import torch

    worst = 0.0
    for l1, l2, l3 in all_paths():
        ours = tensors[f"w3j_{l1}_{l2}_{l3}"]
        theirs = o3.wigner_3j(l1, l2, l3, dtype=torch.float64).numpy()
        err = float(np.abs(ours - theirs).max())
        worst = max(worst, err)
        status = "OK " if err < 1e-10 else "FAIL"
        print(f"  {status} w3j({l1},{l2},{l3}): max |diff| = {err:.2e}")
    if worst >= 1e-10:
        print("MISMATCH against e3nn — reconstruction is wrong!")
        return 1
    print("all 15 tensors match e3nn.o3.wigner_3j exactly.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
