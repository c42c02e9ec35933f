"""Statically-unrolled SCF (SCFConfig.fixed_iters) vs the while_loop solver:
same converged dipoles and forces on a small polarizable box."""

import numpy as np
import pytest
import jax.numpy as jnp

from admp_tpu import ADMPPmeForce, SCFConfig, convert_cart2harm
from admp_tpu.systems import water_system


@pytest.mark.slow
def test_fixed_iters_matches_while_loop():
    s = water_system(n_side=2, spacing=3.1, jitter=0.12, seed=0)
    n = s["positions"].shape[0]
    pairs = [[i, j] for i in range(n) for j in range(i + 1, n)]
    cap = -(-len(pairs) // 128) * 128
    pairs += [[n, n]] * (cap - len(pairs))
    pairs = jnp.asarray(pairs, jnp.int32)
    q = convert_cart2harm(jnp.asarray(s["q_cart"]), 2)
    box = jnp.asarray(s["box"])
    m = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])
    args = (jnp.asarray(s["positions"]), box, pairs, q,
            jnp.asarray(s["pol"]), jnp.asarray(s["tholes"]), m, m, m)

    def build(scf):
        return ADMPPmeForce(
            box, s["axis_types"], s["axis_indices"], s["covalent_map"],
            3.0, 1e-3, 2, lpol=True, scf_config=scf,
        )

    f_while = build(SCFConfig(field_tol=1e-3))
    e1, g1 = f_while.get_forces(*args)
    # enough unrolled iterations to reach the same tight tolerance
    f_fixed = build(SCFConfig(field_tol=1e-3, fixed_iters=15,
                              adjoint_fixed_iters=15))
    e2, g2 = f_fixed.get_forces(*args)
    assert bool(f_fixed.lconverg)
    np.testing.assert_allclose(float(e2), float(e1), rtol=1e-9)
    scale = float(jnp.max(jnp.abs(g1)))
    np.testing.assert_allclose(
        np.asarray(g2), np.asarray(g1), atol=1e-7 * scale
    )
    # different iterate counts stop at slightly different points inside the
    # tolerance ball; the dipoles agree to ~1e-7
    np.testing.assert_allclose(
        np.asarray(f_fixed.U_ind), np.asarray(f_while.U_ind), atol=1e-6
    )
