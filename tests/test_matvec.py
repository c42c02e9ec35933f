"""The cheap SCF matvec == field difference identity.

Every PCG iteration (forward solve and implicit adjoint) applies the gradient
of ``make_induced_quadratic_energy`` — the u-quadratic slice of the
polarizable energy — instead of a full field build. These tests pin it,
single-device, against the defining identity A v == field(v) - field(0)
through the FULL energy (reference semantics: admp/pme.py:111-143's field
evaluations), plus exact linearity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admp_tpu import ADMPPmeForce, SCFConfig, convert_cart2harm
from admp_tpu.models.pme import make_induced_quadratic_energy
from admp_tpu.ops.neighborlist import neighbor_list_cell
from admp_tpu.settings import EngineConfig
from admp_tpu.systems import water_system


@pytest.fixture(scope="module")
def system():
    sysd = water_system(n_side=4, spacing=3.104, jitter=0.12, seed=3)
    positions = jnp.asarray(sysd["positions"])
    box = jnp.asarray(sysd["box"])
    nlist = neighbor_list_cell(positions, box, 4.0)
    return sysd, positions, box, jnp.asarray(nlist.pairs)


def test_quadratic_matvec_matches_field_difference(system):
    sysd, positions, box, pairs = system
    scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])
    pol = jnp.asarray(sysd["pol"])
    tholes = jnp.asarray(sysd["tholes"])
    q_local = convert_cart2harm(jnp.asarray(sysd["q_cart"]), 2)
    pme = ADMPPmeForce(
        box, sysd["axis_types"], sysd["axis_indices"], sysd["covalent_map"],
        4.0, 1e-4, lmax=2, lpol=True, config=EngineConfig(scf=SCFConfig()),
    )

    def field(u):
        return pme.grad_U_fn(
            positions, box, pairs, q_local, u, pol, tholes,
            scales, scales, scales,
        )

    e_uu = make_induced_quadratic_energy(
        jnp.asarray(sysd["covalent_map"]), pme.kappa,
        (pme.K1, pme.K2, pme.K3), EngineConfig(),
    )
    g_uu = jax.grad(e_uu, argnums=3)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((positions.shape[0], 3)) * 0.01)
    want = field(v) - field(jnp.zeros_like(v))
    got = g_uu(positions, box, pairs, v, pol, tholes, scales)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-8 * scale
    )
    # exact linearity of the operator
    w = jnp.asarray(rng.standard_normal((positions.shape[0], 3)) * 0.01)
    lhs = g_uu(positions, box, pairs, 2.0 * v - 0.5 * w, pol, tholes, scales)
    rhs = (
        2.0 * g_uu(positions, box, pairs, v, pol, tholes, scales)
        - 0.5 * g_uu(positions, box, pairs, w, pol, tholes, scales)
    )
    np.testing.assert_allclose(
        np.asarray(lhs), np.asarray(rhs), atol=1e-10 * scale
    )


def test_reduced_matvec_solution_matches_full_operator(system):
    """SCFConfig.matvec_spread_order/matvec_grid_div run PCG on a reduced
    dipole mesh. The initial residual r0 = -field(u0) comes from the FULL
    operator, so the converged dipoles and forces must agree with the
    full-operator solve to the solver tolerance scale, NOT the (much larger)
    mesh-truncation scale (rationale: settings.py SCFConfig; measured ladder:
    examples/fh_accuracy_cpu.out)."""
    import dataclasses as dc

    sysd, positions, box, pairs = system
    scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])
    pol = jnp.asarray(sysd["pol"])
    tholes = jnp.asarray(sysd["tholes"])
    q_local = convert_cart2harm(jnp.asarray(sysd["q_cart"]), 2)

    def solve(scf):
        pme = ADMPPmeForce(
            box, sysd["axis_types"], sysd["axis_indices"],
            sysd["covalent_map"], 4.0, 1e-4, lmax=2, lpol=True,
            config=EngineConfig(scf=scf),
        )
        (e, (u, conv, n_it)), f = pme._value_grad_aux(
            positions, box, pairs, q_local, pol, tholes,
            scales, scales, scales, jnp.zeros_like(positions),
        )
        assert bool(conv)
        return np.asarray(u), np.asarray(f)

    tight = SCFConfig(field_tol=1e-3)
    u_full, f_full = solve(tight)
    u_red, f_red = solve(
        dc.replace(tight, matvec_spread_order=4, matvec_grid_div=2)
    )
    # cold start: the dipole difference sits at the eps_op * |r0| floor
    # (measured 5.4e-4 relative here) — far below the reduced mesh's own
    # ~1e-2 truncation error, because r0 comes from the exact operator.
    du = np.max(np.abs(u_red - u_full)) / np.max(np.abs(u_full))
    assert du < 2e-3, du
    # forces are implicit-adjoint-corrected and first-order-insensitive to
    # the operator perturbation: measured 3.1e-8 relative
    df = np.sqrt(np.mean((f_red - f_full) ** 2)) / np.sqrt(
        np.mean(f_full**2)
    )
    assert df < 1e-6, df
