"""Tests for the on-device MD loop and the parameter-fitting loop."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from admp_tpu import ADMPPmeForce, convert_cart2harm, neighbor_list_dense
from admp_tpu.md import MDState, run_nve
from tests.watergen import water_arrays

M_SCALES = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])


def _setup(n_side=2, seed=21):
    s = water_arrays(n_side=n_side, spacing=3.1, jitter=0.1, seed=seed)
    nl = neighbor_list_dense(s["positions"], s["box"], 4.0)
    return s, jnp.asarray(nl.pairs)


@pytest.mark.slow
def test_nve_energy_conservation():
    # box must exceed 2*rc: multipolar minimum-image energies are discontinuous
    # when pairs can cross half-box (the neighbor list warns on this)
    s, pairs = _setup(n_side=3)
    box = jnp.asarray(s["box"])
    ql = convert_cart2harm(jnp.asarray(s["q_cart"]), 2)
    force = ADMPPmeForce(
        box, s["axis_types"], s["axis_indices"], s["covalent_map"], 3.5, 1e-3, 2
    )

    def force_fn(positions, aux):
        e, g = jax.value_and_grad(force.get_energy)(
            positions, box, pairs, ql, M_SCALES
        )
        return e, -g, aux

    n = s["positions"].shape[0]
    masses = jnp.asarray(np.tile([15.999, 1.008, 1.008], n // 3))
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.normal(0, 0.2, (n, 3)))  # modest kick, A/ps
    e0, f0 = jax.value_and_grad(force.get_energy)(
        jnp.asarray(s["positions"]), box, pairs, ql, M_SCALES
    )

    state = MDState(jnp.asarray(s["positions"]), v0, -f0, None)
    dt = 0.00005  # ps

    def e_total(st):
        pe = force.get_energy(st.positions, box, pairs, ql, M_SCALES)
        ke = 0.5 * jnp.sum(masses[:, None] * st.velocities**2) / 100.0
        return float(pe + ke)

    e_start = e_total(state)
    final, _ = jax.jit(
        lambda st: run_nve(force_fn, masses, dt, st, n_steps=50)
    )(state)
    e_end = e_total(final)
    # NVE drift over 50 small steps must be tiny relative to kinetic energy
    ke = 0.5 * float(jnp.sum(masses[:, None] * v0**2)) / 100.0
    assert abs(e_end - e_start) < 0.02 * ke
    # atoms actually moved
    assert float(jnp.max(jnp.abs(final.positions - state.positions))) > 1e-4


def test_fitting_loop_reduces_loss(tmp_path):
    from admp_tpu.fitting import fit

    s, pairs = _setup(seed=22)
    box = jnp.asarray(s["box"])
    pos = jnp.asarray(s["positions"])
    force = ADMPPmeForce(
        box, s["axis_types"], s["axis_indices"], s["covalent_map"], 3.5, 1e-3, 2
    )
    q_true = convert_cart2harm(jnp.asarray(s["q_cart"]), 2)
    e_target = force.get_energy(pos, box, pairs, q_true, M_SCALES)

    def loss_fn(params, batch):
        del batch
        e = force.get_energy(pos, box, pairs, params["q"], M_SCALES)
        return (e - e_target) ** 2

    q0 = q_true * 1.05  # perturbed start
    import optax

    result = fit(
        loss_fn, {"q": q0}, batches=[None] * 80, optimizer=optax.adam(1e-2),
        checkpoint_dir=None, log_every=0,
    )
    assert result.history[-1]["loss"] < 0.2 * result.history[0]["loss"]


def test_batched_energy_force_loss_single_trace():
    """A stacked batch evaluates through ONE vmapped trace of the potential
    for any batch size (VERDICT r3 item 7: the legacy per-entry Python loop
    unrolled the graph per configuration — recompile per batch size), and
    matches the legacy list-of-entries loss numerically."""
    from admp_tpu.fitting import energy_force_loss, stack_batch

    s, pairs = _setup(seed=24)
    box = jnp.asarray(s["box"])
    pos = jnp.asarray(s["positions"])
    force = ADMPPmeForce(
        box, s["axis_types"], s["axis_indices"], s["covalent_map"], 3.5, 1e-3, 2
    )
    q_true = convert_cart2harm(jnp.asarray(s["q_cart"]), 2)

    trace_count = [0]

    def potential(positions, box_, pairs_, params):
        trace_count[0] += 1
        return force.get_energy(positions, box_, pairs_, params["q"], M_SCALES)

    loss_fn = energy_force_loss(potential)
    params = {"q": q_true * 1.02}

    rng = np.random.default_rng(0)
    entries = []
    for b in range(4):
        p_b = pos + jnp.asarray(rng.normal(0, 0.01, pos.shape))
        e_b, g_b = jax.value_and_grad(force.get_energy)(
            p_b, box, pairs, q_true, M_SCALES
        )
        entries.append((p_b, box, pairs, e_b, -g_b))

    # one jit trace of the stacked loss touches the potential exactly ONCE
    stacked = stack_batch(entries)
    jit_loss = jax.jit(loss_fn)
    l_stacked = float(jit_loss(params, stacked))
    assert trace_count[0] == 1, trace_count[0]

    # a different batch size is a new shape (new outer compile) but still a
    # single potential trace, not one per entry
    stacked2 = stack_batch(entries[:2])
    _ = float(jit_loss(params, stacked2))
    assert trace_count[0] == 2, trace_count[0]

    # numerically identical to the legacy per-entry form
    l_listed = float(loss_fn(params, entries))
    np.testing.assert_allclose(l_stacked, l_listed, rtol=1e-10)

    # gradients flow through the stacked form
    g = jax.grad(lambda p: loss_fn(p, stacked))(params)
    assert float(jnp.max(jnp.abs(g["q"]))) > 0


def test_checkpoint_roundtrip(tmp_path):
    from admp_tpu.checkpoint import restore_checkpoint, save_checkpoint

    state = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 2))}}
    save_checkpoint(tmp_path, state, 7)
    restored, step = restore_checkpoint(tmp_path, state)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(5.0))
    np.testing.assert_allclose(np.asarray(restored["b"]["c"]), 1.0)


@pytest.mark.slow
def test_langevin_thermostat_equilibrates():
    from admp_tpu.md import run_langevin
    from admp_tpu.ops.bonded import (
        harmonic_angle_energy, harmonic_bond_energy, water_bonded_terms,
    )

    s, pairs = _setup(n_side=3, seed=23)
    box = jnp.asarray(s["box"])
    ql = convert_cart2harm(jnp.asarray(s["q_cart"]), 2)
    force = ADMPPmeForce(
        box, s["axis_types"], s["axis_indices"], s["covalent_map"], 3.5, 1e-3, 2
    )
    n_atoms = s["positions"].shape[0]
    b_idx, r0, kb, a_idx, th0, ka = water_bonded_terms(n_atoms // 3)
    # short-range Born-Mayer repulsion (TT kernel) prevents Coulomb collapse
    from admp_tpu import generate_pairwise_interaction, tt_damping_qq_c6_kernel

    tt = generate_pairwise_interaction(tt_damping_qq_c6_kernel, s["covalent_map"])
    tt_args = (
        jnp.asarray(s["tt_a"]), jnp.asarray(s["tt_b"]),
        jnp.asarray(s["tt_q"]), jnp.asarray(s["c_list"])[:, 0],
    )

    def total(positions):
        e = force.get_energy(positions, box, pairs, ql, M_SCALES)
        e = e + tt(positions, box, pairs, M_SCALES, *tt_args)
        e = e + harmonic_bond_energy(positions, box, jnp.asarray(b_idx),
                                     jnp.asarray(r0), jnp.asarray(kb))
        e = e + harmonic_angle_energy(positions, box, jnp.asarray(a_idx),
                                      jnp.asarray(th0), jnp.asarray(ka))
        return e

    def force_fn(positions, aux):
        e, g = jax.value_and_grad(total)(positions)
        return e, -g, aux

    n = s["positions"].shape[0]
    masses = jnp.asarray(np.tile([15.999, 1.008, 1.008], n // 3))
    _, f0 = jax.value_and_grad(total)(jnp.asarray(s["positions"]))
    state = MDState(jnp.asarray(s["positions"]), jnp.zeros((n, 3)), -f0, None)
    target_t = 300.0
    final, kes = jax.jit(
        lambda st: run_langevin(
            force_fn, masses, 5e-4, target_t, 10.0, st, 400,
            jax.random.PRNGKey(0),
        )
    )(state)
    # kinetic temperature should rise from 0 toward the target
    k_b = 0.00831446261815324
    temps = np.asarray(kes) / (1.5 * n * k_b)
    assert temps[0] < 50.0
    assert 120.0 < temps[-100:].mean() < 600.0
    assert np.all(np.isfinite(np.asarray(final.positions)))


@pytest.mark.slow
def test_bonded_terms_minimum_and_gradient():
    from admp_tpu.ops.bonded import (
        harmonic_angle_energy, harmonic_bond_energy, water_bonded_terms,
    )
    from admp_tpu.systems import water_lattice

    positions, box = water_lattice(n_side=2, jitter=0.0, seed=0)
    pos = jnp.asarray(positions)
    box_j = jnp.asarray(box)
    b_idx, r0, kb, a_idx, th0, ka = water_bonded_terms(8)
    eb = harmonic_bond_energy(pos, box_j, jnp.asarray(b_idx), jnp.asarray(r0),
                              jnp.asarray(kb))
    ea = harmonic_angle_energy(pos, box_j, jnp.asarray(a_idx), jnp.asarray(th0),
                               jnp.asarray(ka))
    # template water sits at the XML equilibrium geometry
    assert float(eb) < 1e-6 and float(ea) < 1e-4

    # finite-difference gradient check away from equilibrium
    rng = np.random.default_rng(0)
    pos2 = pos + jnp.asarray(rng.normal(0, 0.05, pos.shape))

    def e_fn(p):
        return harmonic_bond_energy(
            p, box_j, jnp.asarray(b_idx), jnp.asarray(r0), jnp.asarray(kb)
        ) + harmonic_angle_energy(
            p, box_j, jnp.asarray(a_idx), jnp.asarray(th0), jnp.asarray(ka)
        )

    g = jax.grad(e_fn)(pos2)
    eps = 1e-6
    for (a, d) in [(0, 0), (4, 2)]:
        dp = np.asarray(pos2).copy(); dp[a, d] += eps
        dm = np.asarray(pos2).copy(); dm[a, d] -= eps
        fd = (float(e_fn(jnp.asarray(dp))) - float(e_fn(jnp.asarray(dm)))) / (2 * eps)
        np.testing.assert_allclose(float(g[a, d]), fd, rtol=1e-5, atol=1e-7)


def test_mc_barostat_ideal_gas_volume():
    """MC barostat statistical check: with zero potential energy (ideal gas
    of rigid molecules) the ln-V sampling must equilibrate the volume to
    <V> = (n_mol + 2) kT / P (stationary density p(V) ~ V^(n_mol+1)
    exp(-beta P V))."""
    from admp_tpu.md import make_mc_barostat

    n_mol = 32
    k_b = 0.00831446261815324
    temperature = 300.0
    pressure = 0.02  # kJ/mol/A^3
    target = (n_mol + 2) * k_b * temperature / pressure

    rng = np.random.default_rng(0)
    positions = jnp.asarray(rng.uniform(0, 10.0, (3 * n_mol, 3)))
    molecules = np.repeat(np.arange(n_mol), 3)
    box = jnp.eye(3) * 10.0

    step = jax.jit(
        make_mc_barostat(
            lambda p, b: jnp.zeros(()), molecules, pressure, temperature,
            max_dlnv=0.08,
        )
    )

    key = jax.random.PRNGKey(1)
    vols = []
    accepts = 0
    n_steps = 3000
    for it in range(n_steps):
        key, sub = jax.random.split(key)
        positions, box, acc, _e = step(positions, box, sub)
        accepts += int(acc)
        if it >= 500:
            vols.append(abs(float(jnp.linalg.det(box))))
    mean_v = float(np.mean(vols))
    assert accepts > 0.2 * n_steps
    assert abs(mean_v - target) / target < 0.2, (mean_v, target)


def test_mc_barostat_preserves_internal_geometry():
    """Volume moves scale molecular centers only: intramolecular distances
    must be bit-preserved up to fp rounding."""
    from admp_tpu.md import make_mc_barostat

    sysd = water_arrays(n_side=2, spacing=3.0, jitter=0.1, seed=3)
    n = sysd["positions"].shape[0]
    positions = jnp.asarray(sysd["positions"])
    molecules = np.repeat(np.arange(n // 3), 3)
    box = jnp.asarray(sysd["box"])

    step = make_mc_barostat(
        lambda p, b: jnp.zeros(()), molecules, 0.01, 300.0, max_dlnv=0.3
    )
    # zero energy: volume-increasing moves are accepted with probability ~1;
    # draw keys until one is accepted (deterministic PRNG, terminates fast)
    acc = False
    for seed in range(20):
        pos2, box2, acc, _ = step(positions, box, jax.random.PRNGKey(seed))
        if bool(acc):
            break
    assert bool(acc)
    d_before = np.asarray(positions[1::3] - positions[0::3])
    d_after = np.asarray(pos2[1::3] - pos2[0::3])
    np.testing.assert_allclose(d_after, d_before, atol=1e-10)
    assert not np.allclose(np.asarray(box2), np.asarray(box))
