"""Periodic-boundary-condition primitives.

Feature parity with reference: admp/spatial.py:13-34 (minimum-image shift via
fractional coordinates), but written batched-first: a single call handles any
leading batch shape, so there is no separate vmapped variant to keep in sync.
"""

from __future__ import annotations

import jax.numpy as jnp
from admp_tpu.utils.linalg3 import inv3x3


def pbc_shift(dr, box, box_inv=None):
    """Minimum-image wrap of displacement vectors.

    Args:
      dr: (..., 3) displacement vectors in Cartesian coordinates.
      box: (3, 3) box matrix, lattice vectors in rows.
      box_inv: optional precomputed inverse of ``box``.

    Returns:
      (..., 3) wrapped displacements (each fractional component in [-0.5, 0.5)).
    """
    if box_inv is None:
        box_inv = inv3x3(box)
    ds = dr @ box_inv
    ds = ds - jnp.floor(ds + 0.5)
    return ds @ box


def wrap_positions(positions, box, box_inv=None):
    """Wrap absolute positions into the primary cell (fractional in [0, 1))."""
    if box_inv is None:
        box_inv = inv3x3(box)
    s = positions @ box_inv
    s = s - jnp.floor(s)
    return s @ box


# Alias kept so reference-style call sites read naturally; identical function
# because pbc_shift is already batched (reference: admp/spatial.py:34).
v_pbc_shift = pbc_shift
