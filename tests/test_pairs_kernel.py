"""Fused Pallas pair kernel (ops/pallas/pairs.py) vs the XLA SoA pipeline.

The kernel shares the physics source (realspace.perm_coefficients_from_
screening, pair_energy_perm, rotate_harm_components); only the gaussian/erfc
are Mosaic-lowerable reformulations (~1e-7 relative per pair), so energies
and all gradients must agree at the f32 floor."""

import jax
import jax.numpy as jnp
import numpy as np

from admp_tpu import convert_cart2harm, neighbor_list_dense
from admp_tpu.models.pme import pme_real_energy
from admp_tpu.ops.frames import construct_local_frames
from admp_tpu.ops.harmonics import rot_local2global
from admp_tpu.systems import water_system


def _setup(lmax):
    s = water_system(n_side=3, spacing=3.1, jitter=0.12, seed=4)
    n = s["positions"].shape[0]
    pos = jnp.asarray(np.asarray(s["positions"], np.float32))
    box = jnp.asarray(np.asarray(s["box"], np.float32))
    nl = neighbor_list_dense(pos, box, 4.0)
    q_local = jnp.asarray(np.asarray(
        convert_cart2harm(jnp.asarray(s["q_cart"]), 2), np.float32
    ))[:, : (lmax + 1) ** 2]
    m_scales = jnp.asarray(np.array([0.0, 0.3, 0.7, 1.0, 1.0], np.float32))
    frames = construct_local_frames(
        pos, box, jnp.asarray(s["axis_types"]), jnp.asarray(s["axis_indices"])
    )
    qg = rot_local2global(q_local, frames.astype(jnp.float32), lmax)
    cov = jnp.asarray(s["covalent_map"])
    return pos, box, jnp.asarray(nl.pairs), qg, m_scales, cov


def _energy_fn(kind, pairs, cov, lmax):
    def f(pos, box, qg, m_scales):
        return pme_real_energy(
            pos, box, pairs, qg, None, None, None, m_scales, None,
            cov, jnp.float32(0.68), lmax, False, pair_kernel=kind,
        )

    return f


def test_pair_kernel_energy_and_grads_match_xla():
    for lmax in (0, 1, 2):
        pos, box, pairs, qg, m_scales, cov = _setup(lmax)
        fx = _energy_fn("xla", pairs, cov, lmax)
        fk = _energy_fn("interpret", pairs, cov, lmax)
        ex, gx = jax.value_and_grad(fx, argnums=(0, 1, 2, 3))(
            pos, box, qg, m_scales
        )
        ek, gk = jax.value_and_grad(fk, argnums=(0, 1, 2, 3))(
            pos, box, qg, m_scales
        )
        assert abs(float(ek - ex)) < 2e-6 * abs(float(ex)) + 1e-3, lmax
        for a, b, name in zip(gk, gx, ("pos", "box", "Q", "mScales")):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = np.sqrt(np.mean(b ** 2)) + 1e-12
            err = np.sqrt(np.mean((a - b) ** 2)) / scale
            assert err < 3e-6, (lmax, name, err)


def test_pair_kernel_compensated_and_chunked():
    lmax = 2
    pos, box, pairs, qg, m_scales, cov = _setup(lmax)

    def f(kind, chunk, comp):
        return float(pme_real_energy(
            pos, box, pairs, qg, None, None, None, m_scales, None,
            cov, jnp.float32(0.68), lmax, False, pair_chunk=chunk,
            compensated=comp, pair_kernel=kind,
        ))

    # per-pair magnitudes are ~1e4 (intramolecular Ewald corrections), so
    # f32 summation-order reassociation alone moves the 2.5e4 total by ~0.01
    base = f("interpret", None, False)
    assert abs(f("interpret", 128, False) - base) < 0.05
    assert abs(f("interpret", None, True) - base) < 0.05
    assert abs(f("xla", None, False) - base) < 0.05


def test_pair_kernel_lpol_matches_xla():
    """Polarizable (lpol) kernel branch: energy + grads wrt every
    differentiable input match the XLA pipeline at the f32 floor."""
    from admp_tpu.systems import water_system

    lmax = 2
    s = water_system(n_side=3, spacing=3.1, jitter=0.12, seed=5)
    n = s["positions"].shape[0]
    pos = jnp.asarray(np.asarray(s["positions"], np.float32))
    box = jnp.asarray(np.asarray(s["box"], np.float32))
    nl = neighbor_list_dense(pos, box, 4.0)
    pairs = jnp.asarray(nl.pairs)
    q_local = jnp.asarray(np.asarray(
        convert_cart2harm(jnp.asarray(s["q_cart"]), 2), np.float32))
    frames = construct_local_frames(
        pos, box, jnp.asarray(s["axis_types"]), jnp.asarray(s["axis_indices"])
    )
    qg = rot_local2global(q_local, frames.astype(jnp.float32), lmax)
    cov = jnp.asarray(s["covalent_map"])
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.normal(0, 0.05, (n, 3)).astype(np.float32))
    pol = jnp.asarray(np.asarray(s["pol"], np.float32))
    tholes = jnp.asarray(np.asarray(s["tholes"], np.float32))
    m_scales = jnp.asarray(np.array([0.0, 0.3, 0.7, 1.0, 1.0], np.float32))
    p_scales = jnp.asarray(np.array([0.0, 0.5, 1.0, 1.0, 1.0], np.float32))

    def f(kind):
        def g(pos_, box_, qg_, u_, pol_, tholes_, m_, p_):
            return pme_real_energy(
                pos_, box_, pairs, qg_, u_, pol_, tholes_, m_, p_,
                cov, jnp.float32(0.68), lmax, True, pair_kernel=kind,
            )
        return g

    args = (pos, box, qg, u, pol, tholes, m_scales, p_scales)
    ex, gx = jax.value_and_grad(f("xla"), argnums=tuple(range(8)))(*args)
    ek, gk = jax.value_and_grad(f("interpret"), argnums=tuple(range(8)))(*args)
    assert abs(float(ek - ex)) < 2e-6 * abs(float(ex)) + 1e-3
    names = ("pos", "box", "Q", "u", "pol", "tholes", "mScales", "pScales")
    for a, b, name in zip(gk, gx, names):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.all(np.isfinite(b)), name  # incl. dE/dpol (double-where
        # guard in pair_damping_width — finite at zero-pol sites)
        assert np.all(np.isfinite(a)), name
        scale = np.sqrt(np.mean(b ** 2)) + 1e-12
        err = np.sqrt(np.mean((a - b) ** 2)) / scale
        assert err < 5e-6, (name, err)


def test_pair_kernel_uu_matches_xla():
    """SCF-matvec (udud) kernel branch: energy + grads wrt positions/u match
    the XLA radial-projection path."""
    from admp_tpu.models.pme import pme_real_uu_energy
    from admp_tpu.systems import water_system

    s = water_system(n_side=3, spacing=3.1, jitter=0.12, seed=7)
    n = s["positions"].shape[0]
    pos = jnp.asarray(np.asarray(s["positions"], np.float32))
    box = jnp.asarray(np.asarray(s["box"], np.float32))
    nl = neighbor_list_dense(pos, box, 4.0)
    pairs = jnp.asarray(nl.pairs)
    cov = jnp.asarray(s["covalent_map"])
    rng = np.random.default_rng(8)
    u = jnp.asarray(rng.normal(0, 0.05, (n, 3)).astype(np.float32))
    pol = jnp.asarray(np.asarray(s["pol"], np.float32))
    tholes = jnp.asarray(np.asarray(s["tholes"], np.float32))
    p_scales = jnp.asarray(np.array([0.0, 0.5, 1.0, 1.0, 1.0], np.float32))

    def f(kind):
        def g(pos_, u_):
            return pme_real_uu_energy(
                pos_, box, pairs, u_, pol, tholes, p_scales, cov,
                jnp.float32(0.68), pair_kernel=kind,
            )
        return g

    ex, gx = jax.value_and_grad(f("xla"), argnums=(0, 1))(pos, u)
    ek, gk = jax.value_and_grad(f("interpret"), argnums=(0, 1))(pos, u)
    assert abs(float(ek - ex)) < 2e-6 * abs(float(ex)) + 1e-4
    for a, b, name in zip(gk, gx, ("pos", "u")):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.sqrt(np.mean(b ** 2)) + 1e-12
        err = np.sqrt(np.mean((a - b) ** 2)) / scale
        assert err < 5e-6, (name, err)


def test_pair_kernel_second_order_exact_adjoint():
    """The exact-adjoint SCF takes jax.vjp of the field function whose primal
    graph contains the pair kernel's BACKWARD (solver.py solve_bwd) — the
    Hessian-vector custom-vjp chain must reproduce the XLA path's forces."""
    from admp_tpu import ADMPPmeForce, EngineConfig, SCFConfig
    from admp_tpu.systems import water_system

    s = water_system(n_side=2, spacing=3.1, jitter=0.1, seed=9)
    n = s["positions"].shape[0]
    pos = jnp.asarray(np.asarray(s["positions"], np.float32))
    box = jnp.asarray(np.asarray(s["box"], np.float32))
    nl = neighbor_list_dense(pos, box, 4.0)
    pairs = jnp.asarray(nl.pairs)
    q_local = jnp.asarray(np.asarray(
        convert_cart2harm(jnp.asarray(s["q_cart"]), 2), np.float32))
    scales = [jnp.asarray(np.array(v, np.float32)) for v in (
        [0.0, 0.0, 0.0, 1.0, 1.0],
        [0.0, 0.5, 1.0, 1.0, 1.0],
        [0.0, 0.5, 1.0, 1.0, 1.0],
    )]
    pol = jnp.asarray(np.asarray(s["pol"], np.float32))
    tholes = jnp.asarray(np.asarray(s["tholes"], np.float32))

    def forces(kind):
        f = ADMPPmeForce(
            box, s["axis_types"], s["axis_indices"], s["covalent_map"],
            3.0, 1e-3, lmax=2, lpol=True,
            scf_config=SCFConfig(exact_adjoint=True),
            config=EngineConfig(pair_kernel=kind),
        )
        e, frc = f.get_forces(pos, box, pairs, q_local, pol, tholes, *scales)
        return float(e), np.asarray(frc, np.float64)

    ex, fx = forces("xla")
    ek, fk = forces("interpret")
    assert abs(ek - ex) < 2e-6 * abs(ex) + 1e-3
    # the kernel's erfc/exp reformulations (~1e-7/pair) are amplified by the
    # SCF solve conditioning; 3e-5 relative measured, f32 force floor is 4e-4
    err = np.sqrt(np.mean((fk - fx) ** 2)) / np.sqrt(np.mean(fx ** 2))
    assert err < 1e-4, err
