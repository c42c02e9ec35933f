#!/usr/bin/env python
"""Grid-shape ladder for the polarizable bench step (TPU).

The row-gather spread adjoint (ops/pallas/spread._row_gather_impl) needs
lane-aligned mesh rows (K3 % 128 == 0); the pol bench's heuristic 96^3 grid
(and its 48^3 matvec mesh) miss it. This probe times the exact bench.py
polarizable step at (96,96,96) / (96,96,128) / (128,128,128) to decide the
production grid. Writes examples/pol_grid_tpu.out.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).with_suffix(".out")


def build(grid):
    import jax
    import jax.numpy as jnp

    from admp_tpu import ADMPPmeForce, SCFConfig, convert_cart2harm
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.settings import EngineConfig
    from admp_tpu.systems import water_system

    sysd = water_system(n_side=10, spacing=3.104, jitter=0.12, seed=0)
    positions, box = jnp.asarray(sysd["positions"]), jnp.asarray(sysd["box"])
    n = positions.shape[0]
    rc, ethresh = 4.0, 1e-4
    nlist = neighbor_list_cell(positions, box, rc)
    pairs = jnp.asarray(nlist.pairs)
    q_local = convert_cart2harm(jnp.asarray(sysd["q_cart"]), 2)
    pol = jnp.asarray(sysd["pol"])
    tholes = jnp.asarray(sysd["tholes"])
    scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])

    pme = ADMPPmeForce(
        box, sysd["axis_types"], sysd["axis_indices"], sysd["covalent_map"],
        rc, ethresh, lmax=2, lpol=True,
        config=EngineConfig(cache_influence=True, scf=SCFConfig.md()),
    )
    if grid is not None:
        pme.K1, pme.K2, pme.K3 = grid
        pme.refresh_calculators()

    u0, _, _ = pme.optimize_Uind(
        positions, box, pairs, q_local, pol, tholes, scales, scales, scales,
    )
    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.005 * rng.standard_normal((n, 3)))
    vga = pme._value_grad_aux
    n_inner = 10

    @jax.jit
    def multi_step(pos, u):
        def body(carry, _):
            p, u_prev = carry
            (e, (u_new, _c, _n)), f = vga(
                p, box, pairs, q_local, pol, tholes,
                scales, scales, scales, u_prev,
            )
            return (p + drift + 0.0 * f, u_new), e

        (p_out, u_out), es = jax.lax.scan(body, (pos, u), None, length=n_inner)
        return p_out, u_out, es

    return multi_step, (positions, u0), n_inner, (pme.K1, pme.K2, pme.K3)


def main():
    import jax

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    for grid in (None, (96, 96, 128), (128, 128, 128)):
        step, args, n_inner, kk = build(grid)
        t0 = time.time()
        out = step(*args)
        jax.block_until_ready(out)
        tc = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = step(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        e_last = float(out[2][-1])
        emit(f"grid {kk}: {ms:7.2f} ms/step  E={e_last:.4f}  (compile {tc:.0f}s)")

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
