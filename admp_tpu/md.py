"""Minimal on-device molecular dynamics: velocity-Verlet NVE inside lax.scan.

The reference provides no integrator (users bring OpenMM/i-PI); this module
closes the loop for production MD on TPU: the whole trajectory segment runs as
one compiled scan — positions, velocities, forces, and the induced-dipole warm
start never leave the device between steps.

Neighbor-list discipline: the force field sees a FIXED pair list inside a scan
segment. Build it with a skin (list cutoff = rc + ~1 A) and rebuild between
segments (admp_tpu.ops.neighborlist.update_neighbor_list is jit-friendly at
fixed capacity); a stale list makes pair interactions appear/vanish
discontinuously, which shows up as spurious heating in NVT and energy drift in
NVE.
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


def make_langevin_step(force_fn, masses, dt: float, temperature: float,
                       friction: float):
    """BAOAB Langevin integrator step (NVT).

    temperature in K, friction in 1/ps. Uses kB = 0.00831446 kJ/mol/K.
    Returns step(state, key) -> state.
    """
    k_b = 0.00831446261815324
    m = masses[:, None]
    c1 = jnp.exp(-friction * dt)
    sigma = jnp.sqrt(k_b * temperature * (1.0 - c1**2) / m * _ACC)

    def step(state: MDState, key):
        v = state.velocities + 0.5 * dt * _ACC * state.forces / m
        x = state.positions + 0.5 * dt * v
        noise = jax.random.normal(key, v.shape, dtype=v.dtype)
        v = c1 * v + sigma * noise
        x = x + 0.5 * dt * v
        _, f_new, aux = force_fn(x, state.aux)
        v = v + 0.5 * dt * _ACC * f_new / m
        return MDState(x, v, f_new, aux)

    return step


def run_langevin(force_fn, masses, dt, temperature, friction, state: MDState,
                 n_steps: int, key):
    """Run an NVT Langevin trajectory inside one lax.scan; returns the final
    state and per-step kinetic energies."""
    step = make_langevin_step(force_fn, masses, dt, temperature, friction)
    m = masses[:, None]

    def body(carry, k):
        st = MDState(*carry)
        new = step(st, k)
        ke = 0.5 * jnp.sum(m * new.velocities**2) / _ACC
        return (new.positions, new.velocities, new.forces, new.aux), ke

    keys = jax.random.split(key, n_steps)
    flat = (state.positions, state.velocities, state.forces, state.aux)
    (pos, vel, frc, aux), kes = jax.lax.scan(body, flat, keys)
    return MDState(pos, vel, frc, aux), kes


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


def run_nve_metrics(force_fn, masses, dt, state: MDState, n_steps: int,
                    metrics_fn=None):
    """NVE segment with structured per-step metrics (SURVEY §5 observability).

    ``metrics_fn(state) -> dict[str, scalar]`` is evaluated each step inside
    the scan (e.g. the force object's ``get_metrics`` for term energies and
    SCF diagnostics); kinetic and total energies are always included. Returns
    (final_state, metrics) where metrics is a dict of (n_steps,) arrays —
    feed to :func:`format_metrics_lines` for log output.
    """
    step = make_nve_step(force_fn, masses, dt)
    m = masses[:, None]

    def kinetic(v):
        return 0.5 * jnp.sum(m * v * v) / _ACC

    def body(carry, _):
        st = MDState(*carry)
        new = step(st)
        rec = {"e_kinetic": kinetic(new.velocities)}
        if metrics_fn is not None:
            rec.update(metrics_fn(new))
        return (new.positions, new.velocities, new.forces, new.aux), rec

    flat = (state.positions, state.velocities, state.forces, state.aux)
    (pos, vel, frc, aux), recs = jax.lax.scan(body, flat, None, length=n_steps)
    return MDState(pos, vel, frc, aux), recs


def format_metrics_lines(metrics, every: int = 1):
    """Render scanned metrics arrays as structured one-line JSON records."""
    import json

    import numpy as np

    keys = sorted(metrics)
    n = len(np.asarray(metrics[keys[0]]))
    lines = []
    for i in range(0, n, every):
        rec = {"step": i}
        for k in keys:
            v = np.asarray(metrics[k])[i]
            rec[k] = bool(v) if v.dtype == np.bool_ else float(v)
        lines.append(json.dumps(rec))
    return lines
