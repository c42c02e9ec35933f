"""Ewald/PME parameter heuristics.

Parity with reference: admp/pme.py:146-172 (which follows OpenMM's user-guide
formulas), evaluated host-side with numpy because the results (kappa, grid shape)
are static compile-time quantities — grid shapes must be Python ints for jit.
"""

from __future__ import annotations

import numpy as np


def setup_ewald_parameters(rc: float, ethresh: float, box) -> tuple:
    """Choose the Ewald splitting parameter and FFT mesh size.

    kappa = sqrt(-log(2*ethresh)) / rc
    K_i   = ceil(2 * kappa * L_i / (3 * ethresh^(1/5)))

    Args:
      rc: real-space cutoff (Angstrom).
      ethresh: target energy accuracy.
      box: (3, 3) lattice vectors in rows (only the diagonal is used, as in the
        reference — orthorhombic assumption for the mesh heuristic).

    Returns:
      (kappa, K1, K2, K3) with integer K's.
    """
    box = np.asarray(box)
    kappa = float(np.sqrt(-np.log(2.0 * ethresh)) / rc)
    ks = [int(np.ceil(2.0 * kappa * box[i, i] / 3.0 / ethresh**0.2)) for i in range(3)]
    return (kappa, ks[0], ks[1], ks[2])
