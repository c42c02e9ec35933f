#!/usr/bin/env python
"""NPT water: Langevin NVT segments alternated with MC-barostat volume moves.

Demonstrates the full on-device NPT loop (integrator + barostat + polarizable
force field) that the reference ecosystem delegates to OpenMM/i-PI. The energy
closure takes a traced box, so PME influence grids track volume changes
(cache_influence=False); the neighbor list is built with a skin, reused inside
each segment, and refreshed at fixed capacity between segments (Langevin
diffusion plus accepted volume moves would otherwise outrun the skin and
silently drop pairs on longer runs).

Usage: python examples/run_npt.py [--nmol 64] [--steps 200] [--cpu]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nmol", type=int, default=64)
    ap.add_argument("--steps", type=int, default=100, help="MD steps/segment")
    ap.add_argument("--segments", type=int, default=5)
    ap.add_argument("--temperature", type=float, default=300.0)
    ap.add_argument("--pressure-bar", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from admp_tpu import (
        ADMPPmeForce,
        BAR_TO_KJMOL_A3,
        MDState,
        convert_cart2harm,
        generate_pairwise_interaction,
        make_mc_barostat,
        neighbor_list_cell,
        refresh_neighbor_list,
        run_langevin,
        tt_damping_qq_c6_kernel,
    )
    from admp_tpu.settings import EngineConfig
    from admp_tpu.systems import water_system

    n_side = round(args.nmol ** (1 / 3))
    s = water_system(n_side=n_side, spacing=3.104, jitter=0.05, seed=0)
    n = s["positions"].shape[0]
    nmol = n // 3
    print(f"{n} atoms, box {s['box'][0,0]:.2f} A, target "
          f"{args.pressure_bar} bar / {args.temperature} K")

    positions = jnp.asarray(s["positions"])
    box = jnp.asarray(s["box"])
    rc = 4.0
    nl = neighbor_list_cell(positions, box, rc + 1.0)  # 1 A skin
    pairs = jnp.asarray(nl.pairs)
    q_local = convert_cart2harm(jnp.asarray(s["q_cart"]), 2)
    m_scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])
    c_list = jnp.asarray(s["c_list"])
    tt_a, tt_b, tt_q = (jnp.asarray(s[k]) for k in ("tt_a", "tt_b", "tt_q"))

    from admp_tpu.ops.bonded import (
        harmonic_angle_energy,
        harmonic_bond_energy,
        water_bonded_terms,
    )

    bond_idx, r0, k_bond, angle_idx, theta0, k_angle = water_bonded_terms(nmol)
    bond_idx = jnp.asarray(bond_idx)
    angle_idx = jnp.asarray(angle_idx)
    r0, k_bond = jnp.asarray(r0), jnp.asarray(k_bond)
    theta0, k_angle = jnp.asarray(theta0), jnp.asarray(k_angle)

    # NPT: influence grids must track the box -> cache_influence=False
    pme = ADMPPmeForce(
        box, s["axis_types"], s["axis_indices"], s["covalent_map"],
        rc, 1e-4, lmax=2, config=EngineConfig(cache_influence=False),
    )
    tt = generate_pairwise_interaction(
        tt_damping_qq_c6_kernel, s["covalent_map"]
    )

    def energy(pos, bx, prs):
        e = pme.get_energy(pos, bx, prs, q_local, m_scales)
        e = e + tt(pos, bx, prs, m_scales, tt_a, tt_b, tt_q, c_list[:, 0])
        # intramolecular MPID water springs keep the flexible molecules bound
        e = e + harmonic_bond_energy(pos, bx, bond_idx, r0, k_bond)
        return e + harmonic_angle_energy(pos, bx, angle_idx, theta0, k_angle)

    masses = jnp.asarray(np.tile([15.999, 1.008, 1.008], nmol))
    dt, friction = 0.0002, 10.0
    pressure = args.pressure_bar * BAR_TO_KJMOL_A3
    molecules = np.repeat(np.arange(nmol), 3)
    barostat = jax.jit(
        make_mc_barostat(energy, molecules, pressure, args.temperature)
    )

    key = jax.random.PRNGKey(0)
    state = MDState(
        positions,
        jnp.zeros_like(positions),
        -jax.grad(energy)(positions, box, pairs),
        None,
    )
    accepts = 0
    t0 = time.time()
    for seg in range(args.segments):
        key, k_md, k_bar = jax.random.split(key, 3)
        state, kes = run_langevin(
            lambda p, aux: (0.0, -jax.grad(energy)(p, box, pairs), aux),
            masses, dt, args.temperature, friction, state, args.steps, k_md,
        )
        # refresh at fixed capacity: the segment's diffusion (and any accepted
        # volume move below) eats into the 1 A skin
        nl = refresh_neighbor_list(nl, state.positions, box)
        pairs = jnp.asarray(nl.pairs)
        pos, box, acc, e = barostat(state.positions, box, k_bar, pairs)
        accepts += int(acc)
        if bool(acc):
            nl = refresh_neighbor_list(nl, pos, box)
            pairs = jnp.asarray(nl.pairs)
        state = state._replace(
            positions=pos, forces=-jax.grad(energy)(pos, box, pairs)
        )
        vol = abs(float(jnp.linalg.det(box)))
        k_b = 0.00831446261815324
        t_inst = 2.0 * float(kes[-1]) / (3.0 * n * k_b)
        print(f"segment {seg}: E = {float(e):10.3f} kJ/mol  V = {vol:9.1f} "
              f"A^3  T_inst = {t_inst:6.1f} K  barostat "
              f"{'accept' if bool(acc) else 'reject'}")
    print(f"# {accepts}/{args.segments} volume moves accepted, "
          f"{time.time()-t0:.1f}s total")


if __name__ == "__main__":
    main()
