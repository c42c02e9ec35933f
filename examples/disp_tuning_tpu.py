#!/usr/bin/env python
"""Dispersion-grid tuning: full-force-field step time on the real TPU.

CPU f64 accuracy deltas (vs the K=154^3 ethresh=1e-4 parity grids, water_1024,
measured round 2):
  disp_ethresh=5e-4  -> K=101^3 (3.5x fewer grid points), dE = -0.52 kJ/mol of
                        70104 (7e-6 relative), force RMSE 1.3e-7 relative
  disp_ethresh=1e-3  -> K=83^3, dE = -8.5 (1.2e-4), force RMSE 1.4e-6
  pmax_recip=6       -> dE = -10564 (!): the C8/C10 k-space channels carry a
                        large (mostly configuration-independent) gamma-point
                        energy; force RMSE only 1.2e-4, so this is an
                        MD-forces-only option, NOT an energy-parity one.

This script times the full water_1024 step (electro PME + dispersion PME + TT)
for each candidate and writes examples/disp_tuning_tpu.out.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).with_suffix(".out")


def build_step(disp_config):
    import jax
    import jax.numpy as jnp

    from admp_tpu import (
        ADMPDispPmeForce,
        ADMPPmeForce,
        convert_cart2harm,
        generate_pairwise_interaction,
        tt_damping_qq_c6_kernel,
    )
    from admp_tpu.io import load_mpid_system
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.systems import water_system as _ws

    ref = pathlib.Path("/root/reference/examples/water_1024")
    s = load_mpid_system(str(ref / "water1024.pdb"), str(ref / "mpidwater.xml"))
    positions, box = jnp.asarray(s.positions), jnp.asarray(s.box)
    nl = neighbor_list_cell(positions, box, 4.0)
    pairs = jnp.asarray(nl.pairs)
    q_local = convert_cart2harm(jnp.asarray(s.q_cart), 2)
    m_scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])
    params = _ws(n_side=1)
    nmol = s.n_atoms // 3
    c_j = jnp.asarray(np.tile(params["c_list"][:3], (nmol, 1)))
    a_j = jnp.asarray(np.tile(params["tt_a"][:3], nmol))
    b_j = jnp.asarray(np.tile(params["tt_b"][:3], nmol))
    qt_j = jnp.asarray(np.tile(params["tt_q"][:3], nmol))

    pme = ADMPPmeForce(box, s.axis_types, s.axis_indices, s.covalent_map,
                       4.0, 1e-4, lmax=2)
    pme.update_env("kappa", 0.657065221219616)
    disp = ADMPDispPmeForce(box, s.covalent_map, 4.0, 1e-4, pmax=10,
                            config=disp_config)
    tt = generate_pairwise_interaction(tt_damping_qq_c6_kernel, s.covalent_map)

    def total_energy(pos):
        e = pme.get_energy(pos, box, pairs, q_local, m_scales)
        e = e + disp.get_energy(pos, box, pairs, c_j, m_scales)
        e = e + tt(pos, box, pairs, m_scales, a_j, b_j, qt_j, c_j[:, 0])
        return e

    grad_step = jax.value_and_grad(total_energy)
    n_inner = 10

    @jax.jit
    def multi_step(pos):
        def body(p, _):
            e, f = grad_step(p)
            return p + 0.0 * f, e
        return jax.lax.scan(body, pos, None, length=n_inner)

    return multi_step, positions, n_inner, (disp.K1, disp.K2, disp.K3)


def main():
    import jax

    from admp_tpu.settings import EngineConfig

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    variants = [
        ("parity (ethresh=1e-4, cached influence)",
         EngineConfig(cache_influence=True)),
        ("disp_ethresh=5e-4 (cached)",
         EngineConfig(disp_ethresh=5e-4, cache_influence=True)),
        ("disp_ethresh=5e-4 + fft-friendly (cached)",
         EngineConfig(disp_ethresh=5e-4, fft_friendly_grid=True,
                      cache_influence=True)),
        ("disp_ethresh=1e-3 (cached)",
         EngineConfig(disp_ethresh=1e-3, cache_influence=True)),
    ]
    for name, cfg in variants:
        step, pos, n_inner, grid = build_step(cfg)
        out = step(pos)
        jax.block_until_ready(out)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = step(pos)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times) / n_inner * 1e3)
        e0 = float(out[1][0])
        emit(f"{name:44s} disp-grid={grid}  {ms:7.2f} ms/step  "
             f"E_total={e0:.3f}")

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
