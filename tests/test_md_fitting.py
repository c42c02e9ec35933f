"""Tests for the on-device MD loop and the parameter-fitting loop."""

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


def test_checkpoint_roundtrip(tmp_path):
    from admp_tpu.checkpoint import restore_checkpoint, save_checkpoint

    state = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 2))}}
    save_checkpoint(tmp_path, state, 7)
    restored, step = restore_checkpoint(tmp_path, state)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(5.0))
    np.testing.assert_allclose(np.asarray(restored["b"]["c"]), 1.0)
