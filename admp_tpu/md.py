"""Minimal on-device molecular dynamics: velocity-Verlet NVE inside lax.scan.

The reference provides no integrator (users bring OpenMM/i-PI); this module
closes the loop for production MD on TPU: the whole trajectory segment runs as
one compiled scan — positions, velocities, forces, and the induced-dipole warm
start never leave the device between steps.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

# kJ/mol, A, ps unit system: m in g/mol, dt in ps, v in A/ps.
# a [A/ps^2] = F [kJ/mol/A] / m [g/mol] * 100
_ACC = 100.0


class MDState(NamedTuple):
    positions: jnp.ndarray
    velocities: jnp.ndarray
    forces: jnp.ndarray
    aux: Any = None


def make_nve_step(force_fn, masses, dt: float):
    """Velocity-Verlet step. force_fn(positions, aux) -> (energy, forces, aux')."""
    m = masses[:, None]

    def step(state: MDState):
        v_half = state.velocities + 0.5 * dt * _ACC * state.forces / m
        x_new = state.positions + dt * v_half
        _, f_new, aux = force_fn(x_new, state.aux)
        v_new = v_half + 0.5 * dt * _ACC * f_new / m
        return MDState(x_new, v_new, f_new, aux)

    return step


def run_nve(force_fn, masses, dt, state: MDState, n_steps: int, report_every=0):
    """Run n_steps of NVE inside one lax.scan; returns final state and a
    (n_reports,) array of total energies when report_every > 0."""
    step = make_nve_step(force_fn, masses, dt)
    m = masses[:, None]

    def kinetic(v):
        return 0.5 * jnp.sum(m * v * v) / _ACC

    def body(carry, _):
        new = step(carry)
        report = kinetic(new.velocities)
        return new, report

    flat_state = (state.positions, state.velocities, state.forces, state.aux)

    def body_flat(carry, _):
        st = MDState(*carry)
        new, rep = body(st, None)
        return (new.positions, new.velocities, new.forces, new.aux), rep

    (pos, vel, frc, aux), kes = jax.lax.scan(
        body_flat, flat_state, None, length=n_steps
    )
    return MDState(pos, vel, frc, aux), kes
