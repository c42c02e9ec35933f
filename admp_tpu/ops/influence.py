"""Reciprocal-space influence functions C(k^2) for Ewald/PME convolutions.

Parity with reference: admp/recip.py:434-462. Each kernel also exposes its
analytic k=0 limit so the gamma point (needed by dispersion PME, where the
k=0 term is *included*, reference: admp/recip.py:417-421) can be evaluated
without a 0/0 or a sqrt(0) NaN in the gradient.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.special as jss

from admp_tpu.utils.accmath import exp_accurate
from admp_tpu.utils.constants import SQRT_PI


def ck_1(ksq, kappa, volume):
    """Coulomb 1/r influence: 2 pi / (V k^2) * exp(-k^2 / 4 kappa^2).

    Diverges at k=0 — electrostatics always excludes the gamma point
    (reference: admp/recip.py:413-415).
    """
    return 2.0 * jnp.pi / volume / ksq * exp_accurate(-ksq / 4.0 / kappa**2)


ck_1.at_zero = None  # gamma point must be excluded


def _x_terms(ksq, kappa):
    x2 = ksq / 4.0 / kappa**2
    x = jnp.sqrt(x2)
    return x, x2, exp_accurate(-x2), jss.erfc(x)


def ck_6(ksq, kappa, volume):
    x, x2, exp_x2, erfc_x = _x_terms(ksq, kappa)
    f = (1.0 - 2.0 * x2) * exp_x2 + 2.0 * x2 * x * SQRT_PI * erfc_x
    return SQRT_PI * jnp.pi / 2.0 / volume * kappa**3 * f / 3.0


ck_6.at_zero = lambda kappa, volume: SQRT_PI * jnp.pi / 2.0 / volume * kappa**3 / 3.0


def ck_8(ksq, kappa, volume):
    x, x2, exp_x2, erfc_x = _x_terms(ksq, kappa)
    x4 = x2 * x2
    f = (3.0 - 2.0 * x2 + 4.0 * x4) * exp_x2 - 4.0 * x4 * x * SQRT_PI * erfc_x
    return SQRT_PI * jnp.pi / 2.0 / volume * kappa**5 * f / 45.0


ck_8.at_zero = lambda kappa, volume: SQRT_PI * jnp.pi / 2.0 / volume * kappa**5 * 3.0 / 45.0


def ck_10(ksq, kappa, volume):
    x, x2, exp_x2, erfc_x = _x_terms(ksq, kappa)
    x4 = x2 * x2
    x6 = x4 * x2
    f = (15.0 - 6.0 * x2 + 4.0 * x4 - 8.0 * x6) * exp_x2 + 8.0 * x6 * x * SQRT_PI * erfc_x
    return SQRT_PI * jnp.pi / 2.0 / volume * kappa**7 * f / 1260.0


ck_10.at_zero = lambda kappa, volume: SQRT_PI * jnp.pi / 2.0 / volume * kappa**7 * 15.0 / 1260.0
