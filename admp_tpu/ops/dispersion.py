"""Real-space dispersion Ewald kernel (C6/C8/C10 with erfc-like screening).

Parity with reference: admp/disp_pme.py:126-251, vectorized over padded pair
batches with a mask instead of host-side pair filtering.
"""

from __future__ import annotations

import jax.numpy as jnp

from admp_tpu.utils.accmath import exp_accurate


def g_screening(x2, pmax: int):
    """g_p(x^2) incomplete-gamma screening polynomials times exp(-x^2).

    Parity with reference: admp/disp_pme.py:219-251. Returns a tuple of up to
    three arrays (g6, g8, g10).
    """
    x4 = x2 * x2
    exp_x2 = exp_accurate(-x2)
    g6 = 1.0 + x2 + 0.5 * x4
    out = [g6]
    if pmax >= 8:
        g8 = g6 + x4 * x2 / 6.0
        out.append(g8)
    if pmax >= 10:
        out.append(g8 + x4 * x4 / 24.0)
    return tuple(g * exp_x2 for g in out)


def dispersion_pair_energy(r2, c_i, c_j, mscale, kappa, pmax: int):
    """Per-pair real-space dispersion energy.

    e = sum_p (mscale + g_p - 1) c_p_i c_p_j / r^p
    (reference: admp/disp_pme.py:179-216).

    Args:
      r2: (...,) squared pair distances (pre-sanitized for masked lanes).
      c_i, c_j: (..., n_p) per-site sqrt-coefficients, columns (C6, C8, C10).
    """
    x2 = kappa * kappa * r2
    g = g_screening(x2, pmax)
    r6 = r2 * r2 * r2
    e = (mscale + g[0] - 1.0) * c_i[..., 0] * c_j[..., 0] / r6
    if pmax >= 8:
        r8 = r6 * r2
        e = e + (mscale + g[1] - 1.0) * c_i[..., 1] * c_j[..., 1] / r8
    if pmax >= 10:
        r10 = r8 * r2
        e = e + (mscale + g[2] - 1.0) * c_i[..., 2] * c_j[..., 2] / r10
    return e
