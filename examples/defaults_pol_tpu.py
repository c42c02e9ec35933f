#!/usr/bin/env python
"""Default-configuration polarizable step (round-4 VERDICT item 3).

The round-4 measured-best numbers (FH 18.3 ms, exact adjoint 38.9 ms)
required bench-only kwargs: manual K3=128, pairs_i_sorted=True,
cache_influence=True. Round 5 folds the first two into the defaults
(lane_align_grid='auto' rounds the heuristic 96^3 grid to (96,96,128) on
TPU/f32; passing the NeighborList OBJECT resolves pairs_i_sorted from its
own i_sorted contract). This probe measures what a DEFAULT-config user now
gets on the 3000-atom bench system:

  row 1: EngineConfig(scf=SCFConfig.md())            — FH MD profile
  row 2: EngineConfig()                              — exact adjoint
  rows 3-4: + cache_influence=True                   — the remaining kwarg

Targets: FH <= 19 ms, exact adjoint <= 40 ms. Writes
examples/defaults_pol_tpu.out.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).with_suffix(".out")


def main():
    import jax
    import jax.numpy as jnp

    from admp_tpu import ADMPPmeForce, SCFConfig, convert_cart2harm
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.settings import EngineConfig
    from admp_tpu.systems import water_system

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    sysd = water_system(n_side=10, spacing=3.104, jitter=0.12, seed=0)
    positions = jnp.asarray(sysd["positions"])
    box = jnp.asarray(sysd["box"])
    n = positions.shape[0]
    nlist = neighbor_list_cell(positions, box, 4.0)
    q_local = convert_cart2harm(jnp.asarray(sysd["q_cart"]), 2)
    pol = jnp.asarray(sysd["pol"])
    tholes = jnp.asarray(sysd["tholes"])
    scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])
    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.005 * rng.standard_normal((n, 3)))
    n_inner = 10

    def measure(label, config):
        pme = ADMPPmeForce(
            box, sysd["axis_types"], sysd["axis_indices"],
            sysd["covalent_map"], 4.0, 1e-4, lmax=2, lpol=True,
            config=config,
        )
        # the PUBLIC surface with the NeighborList object: resolves the
        # sorted-pairs hint exactly as a user's MD loop would
        pairs = pme._accept_pairs(nlist)
        vga = pme._value_grad_aux

        @jax.jit
        def multi_step(pos, u):
            def body(carry, _):
                p, u_prev = carry
                (e, (u_new, _c, _n)), f = vga(
                    p, box, pairs, q_local, pol, tholes,
                    scales, scales, scales, u_prev,
                )
                return (p + drift + 0.0 * f, u_new), e

            return jax.lax.scan(body, (pos, u), None, length=n_inner)

        u0 = jnp.zeros((n, 3), dtype=positions.dtype)
        out = multi_step(positions, u0)
        jax.block_until_ready(out)
        (p_w, u_w), _ = out
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = multi_step(positions, u_w)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{label:58s} {ms:8.2f} ms/step  grid=({pme.K1},{pme.K2},{pme.K3})"
             f" sorted={pme.config.pairs_i_sorted}")
        return ms

    emit(f"system: {n} atoms; defaults probe (no bench-only kwargs)")
    measure("FH md() profile, DEFAULT config",
            EngineConfig(scf=SCFConfig.md()))
    measure("exact adjoint, DEFAULT config", EngineConfig())
    measure("FH md() + cache_influence",
            EngineConfig(scf=SCFConfig.md(), cache_influence=True))
    measure("exact adjoint + cache_influence",
            EngineConfig(cache_influence=True))

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
