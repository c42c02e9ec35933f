#!/usr/bin/env python
"""Flagship example: full MPID water force field, energies + forces.

Equivalent of reference examples/water_1024/run_admp.py, but self-contained:
with --pdb/--xml it loads the reference data files; otherwise it synthesizes a
liquid-density box of --nmol waters. Prints per-term energies (electrostatic
PME incl. optional polarization, dispersion PME, Tang-Toennies) and timing.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pdb")
    ap.add_argument("--xml")
    ap.add_argument("--nmol", type=int, default=216)
    ap.add_argument("--rc", type=float, default=4.0)
    ap.add_argument("--ethresh", type=float, default=1e-4)
    ap.add_argument("--polarizable", action="store_true")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from admp_tpu import (
        ADMPDispPmeForce, ADMPPmeForce, convert_cart2harm,
        generate_pairwise_interaction, neighbor_list_cell,
        tt_damping_qq_c6_kernel,
    )

    if args.pdb and args.xml:
        from admp_tpu.io import load_mpid_system

        s = load_mpid_system(args.pdb, args.xml)
        positions, box = s.positions, s.box
        axis_types, axis_indices = s.axis_types, s.axis_indices
        covalent_map, q_cart = s.covalent_map, s.q_cart
        pol, tholes = s.pol, s.tholes
        from admp_tpu.systems import water_system

        ref = water_system(n_side=1)
        nmol = s.n_atoms // 3
        c_list = np.tile(ref["c_list"][:3], (nmol, 1))
        tt_a = np.tile(ref["tt_a"][:3], nmol)
        tt_b = np.tile(ref["tt_b"][:3], nmol)
        tt_q = np.tile(ref["tt_q"][:3], nmol)
    else:
        from admp_tpu.systems import water_system

        n_side = round(args.nmol ** (1 / 3))
        s = water_system(n_side=n_side, spacing=3.104, jitter=0.12, seed=0)
        positions, box = s["positions"], s["box"]
        axis_types, axis_indices = s["axis_types"], s["axis_indices"]
        covalent_map, q_cart = s["covalent_map"], s["q_cart"]
        pol, tholes = s["pol"], s["tholes"]
        c_list, tt_a, tt_b, tt_q = s["c_list"], s["tt_a"], s["tt_b"], s["tt_q"]

    n = positions.shape[0]
    print(f"system: {n} atoms, box diag {np.round(np.diag(box), 3)}")

    nlist = neighbor_list_cell(positions, box, args.rc)
    print(f"pairs: capacity {nlist.capacity}, overflow {bool(nlist.did_overflow)}")
    pairs = jnp.asarray(nlist.pairs)
    pos = jnp.asarray(positions)
    box_j = jnp.asarray(box)
    q_local = convert_cart2harm(jnp.asarray(q_cart), 2)
    m_scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])

    pme = ADMPPmeForce(
        box_j, axis_types, axis_indices, covalent_map, args.rc, args.ethresh,
        lmax=2, lpol=args.polarizable,
    )
    disp = ADMPDispPmeForce(box_j, covalent_map, args.rc, args.ethresh, pmax=10)
    tt = generate_pairwise_interaction(tt_damping_qq_c6_kernel, covalent_map)

    if args.polarizable:
        e_args = (pos, box_j, pairs, q_local, jnp.asarray(pol),
                  jnp.asarray(tholes), m_scales, m_scales, m_scales)
    else:
        e_args = (pos, box_j, pairs, q_local, m_scales)

    t0 = time.time()
    e_pme, f_pme = pme.get_forces(*e_args)
    jax.block_until_ready(f_pme)
    print(f"electrostatic PME: {float(e_pme):14.4f} kJ/mol "
          f"(compile+run {time.time()-t0:.1f}s)")
    if args.polarizable:
        print(f"  SCF converged={bool(pme.lconverg)} iters={int(pme.n_cycle)}")

    e_disp, f_disp = disp.get_forces(pos, box_j, pairs, jnp.asarray(c_list), m_scales)
    print(f"dispersion PME:    {float(e_disp):14.4f} kJ/mol")
    import jax as _jax
    e_tt, f_tt = _jax.value_and_grad(tt)(
        pos, box_j, pairs, m_scales, jnp.asarray(tt_a), jnp.asarray(tt_b),
        jnp.asarray(tt_q), jnp.asarray(c_list)[:, 0],
    )
    print(f"Tang-Toennies:     {float(e_tt):14.4f} kJ/mol")

    # timed steps
    from admp_tpu.utils.profiling import time_fn

    dt = time_fn(lambda p: pme.get_forces(*((p,) + e_args[1:]))[1], pos, iters=5)
    print(f"PME energy+force step: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
