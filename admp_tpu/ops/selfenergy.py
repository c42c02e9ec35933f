"""Ewald self-energy terms and the polarization penalty.

Parity with reference: admp/pme.py:738-774 and admp/disp_pme.py:254-279.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from admp_tpu.utils.accmath import compensated_sum
from admp_tpu.utils.constants import DIELECTRIC


def pme_self_energy(q_harm, kappa, lmax: int = 2):
    """Multipolar Ewald self energy.

    E_self = - kappa/sqrt(pi) * sum_a sum_lm (2 kappa^2)^l / (2l+1)!! * Q_lm^2 * DIELECTRIC
    (reference: admp/pme.py:738-757).

    The sum reaches ~1e6 kJ/mol magnitudes that cancel against the real-space
    exclusion corrections, so in float32 it is accumulated with the error-free
    TwoSum tree (utils/accmath.py) — plain f32 tree summation here costs
    ~0.5 kJ/mol of the total-energy budget.
    """
    n_harm = (lmax + 1) ** 2
    l_list = np.array([0] + [1] * 3 + [2] * 5)[:n_harm]
    l_fac2 = np.array([1] + [3] * 3 + [15] * 5)[:n_harm]
    factor = kappa / np.sqrt(np.pi) * (2.0 * kappa**2) ** l_list / l_fac2
    factor = jnp.asarray(factor, dtype=q_harm.dtype)
    terms = factor[None, :] * q_harm[:, :n_harm] ** 2
    total = (
        compensated_sum(terms) if terms.dtype == jnp.float32 else jnp.sum(terms)
    )
    return -total * DIELECTRIC


def polarization_penalty(u_ind, pol):
    """Harmonic polarization work term sum_a |U_a|^2 / (2 pol_a) * DIELECTRIC.

    Zero-polarizability sites are floored at 1e-8 exactly as the reference's
    trim_val_0 (admp/pme.py:771-774).
    """
    pol_safe = jnp.maximum(pol, 1e-8)
    return jnp.sum(0.5 / pol_safe * jnp.sum(u_ind * u_ind, axis=-1)) * DIELECTRIC


def dispersion_self_energy(c_list, kappa, pmax: int):
    """Dispersion Ewald self energy, E_p = -kappa^p / const_p * sum c_p^2
    with const = (12, 48, 240) for p = (6, 8, 10) (reference: admp/disp_pme.py:254-279).
    """
    energy = -(kappa**6) / 12.0 * jnp.sum(c_list[:, 0] ** 2)
    if pmax >= 8:
        energy = energy - kappa**8 / 48.0 * jnp.sum(c_list[:, 1] ** 2)
    if pmax >= 10:
        energy = energy - kappa**10 / 240.0 * jnp.sum(c_list[:, 2] ** 2)
    return energy
