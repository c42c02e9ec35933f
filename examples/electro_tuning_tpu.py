#!/usr/bin/env python
"""Electrostatic-grid tuning: the electro reciprocal is the dominant block of
the nonpolarizable full-FF step (~20 ms of ~36 at K=154^3). At fixed kappa
(pinned to the MPID value), shrinking K trades mesh-resolution accuracy for
the K^3 FFT/influence cost and the scatter/gather traffic.

Run modes:
  --timing    (TPU): full-FF step time per electro-grid candidate
  --accuracy  (CPU f64): dE and force-RMSE deltas vs the K=154 parity grid

Results are appended to examples/electro_tuning_tpu.out.
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).with_suffix(".out")

KAPPA = 0.657065221219616
GRIDS = [None, (144, 144, 144), (128, 128, 128), (120, 120, 120),
         (112, 112, 112)]


def load_inputs():
    import jax.numpy as jnp

    from admp_tpu import convert_cart2harm
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
    return s, positions, box, pairs, q_local, m_scales, (c_j, a_j, b_j, qt_j)


def build_pme(s, box, grid, cache=True):
    from admp_tpu import ADMPPmeForce
    from admp_tpu.settings import EngineConfig

    pme = ADMPPmeForce(
        box, s.axis_types, s.axis_indices, s.covalent_map, 4.0, 1e-4, lmax=2,
        config=EngineConfig(cache_influence=cache),
    )
    pme.kappa = KAPPA
    if grid is not None:
        pme.K1, pme.K2, pme.K3 = grid
    pme.refresh_calculators()
    return pme


def emit(msg):
    print(msg, flush=True)
    with OUT.open("a") as fh:
        fh.write(str(msg) + "\n")


def run_timing():
    import jax
    import jax.numpy as jnp

    from admp_tpu import (
        ADMPDispPmeForce,
        generate_pairwise_interaction,
        tt_damping_qq_c6_kernel,
    )
    from admp_tpu.settings import EngineConfig

    s, positions, box, pairs, q_local, m_scales, (c_j, a_j, b_j, qt_j) = (
        load_inputs()
    )
    disp = ADMPDispPmeForce(
        box, s.covalent_map, 4.0, 1e-4, pmax=10,
        config=EngineConfig(disp_ethresh=2e-4, disp_spread_order=4,
                            cache_influence=True),
    )
    disp.kappa = KAPPA
    disp.refresh_calculators()
    tt = generate_pairwise_interaction(tt_damping_qq_c6_kernel, s.covalent_map)

    for grid in GRIDS:
        pme = build_pme(s, box, grid)

        def total_energy(pos):
            e = pme.get_energy(pos, box, pairs, q_local, m_scales)
            e = e + disp.get_energy(pos, box, pairs, c_j, m_scales)
            e = e + tt(pos, box, pairs, m_scales, a_j, b_j, qt_j, c_j[:, 0])
            return e

        grad_step = jax.value_and_grad(total_energy)
        n_inner = 10
        rng = np.random.default_rng(1)
        drift = jnp.asarray(0.0005 * rng.standard_normal(positions.shape),
                            dtype=positions.dtype)

        @jax.jit
        def multi_step(pos):
            def body(p, _):
                e, f = grad_step(p)
                return p + drift + 0.0 * f, e
            return jax.lax.scan(body, pos, None, length=n_inner)

        out = multi_step(positions)
        jax.block_until_ready(out)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = multi_step(positions)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times) / n_inner * 1e3)
        label = "parity-K154" if grid is None else f"K={grid[0]}"
        emit(f"[timing/TPU] electro {label:12s} grid={pme.K1,pme.K2,pme.K3}"
             f"  full-FF {ms:7.2f} ms/step  E0={float(out[1][0]):.3f}")


def run_accuracy():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    s, positions, box, pairs, q_local, m_scales, _ = load_inputs()

    ref_pme = build_pme(s, box, None, cache=False)
    e_ref, f_ref = ref_pme.get_forces(positions, box, pairs, q_local, m_scales)
    f_ref = np.asarray(f_ref)
    fnorm = np.sqrt(np.mean(f_ref**2))
    emit(f"[accuracy/CPU-f64] parity electro grid "
         f"{ref_pme.K1, ref_pme.K2, ref_pme.K3}: E = {float(e_ref):.6f}")

    for grid in GRIDS[1:]:
        pme = build_pme(s, box, grid, cache=False)
        e, f = pme.get_forces(positions, box, pairs, q_local, m_scales)
        df = np.asarray(f) - f_ref
        rmse = np.sqrt(np.mean(df**2)) / fnorm
        emit(f"[accuracy/CPU-f64] K={grid[0]:3d}: dE = {float(e - e_ref):+.4f}"
             f" kJ/mol  force RMSE = {rmse:.3e} relative")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--timing", action="store_true")
    ap.add_argument("--accuracy", action="store_true")
    args = ap.parse_args()
    if args.accuracy:
        run_accuracy()
    if args.timing:
        run_timing()
