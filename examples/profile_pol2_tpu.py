#!/usr/bin/env python
"""Stage profile of the polarizable bench step at the BENCH-EXACT config
(SCFConfig.md(), cache_influence, pairs_i_sorted, K3=128 lane-aligned grid).

Decomposes the 18.3 ms primary metric into its structural parts:
  1. fixed-multipole e+g (lpol=False, same grids) — the floor
  2. frozen-dipole e+g (energy_fn at fixed u, value_and_grad over positions)
     — the cost of ONE full pipeline pass (the FH step runs ~two: the
     solver's r0 = -field(u0) build and the final energy+backward)
  3. field(u0) build alone (grad_U of the energy at fixed u)
  4. one u-quadratic matvec (the warm PCG iteration unit)
  5. SCF solve alone (warm, drifting positions)
  6. FULL step (bench primary)

Writes examples/profile_pol2_tpu.out.
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

    sysd = water_system(n_side=10, spacing=3.104, jitter=0.12, seed=0)
    positions = jnp.asarray(sysd["positions"], dtype=jnp.float32)
    box = jnp.asarray(sysd["box"], dtype=jnp.float32)
    n = positions.shape[0]
    rc, ethresh = 4.0, 1e-4
    nlist = neighbor_list_cell(positions, box, rc)
    pairs = jnp.asarray(nlist.pairs)
    q_local = convert_cart2harm(jnp.asarray(sysd["q_cart"]), 2).astype(
        jnp.float32
    )
    pol = jnp.asarray(sysd["pol"], dtype=jnp.float32)
    tholes = jnp.asarray(sysd["tholes"], dtype=jnp.float32)
    scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0], dtype=jnp.float32)

    cfg = EngineConfig(cache_influence=True, scf=SCFConfig.md(),
                       pairs_i_sorted=True)
    pme = ADMPPmeForce(
        box, sysd["axis_types"], sysd["axis_indices"], sysd["covalent_map"],
        rc, ethresh, lmax=2, lpol=True, config=cfg,
    )
    pme.K3 = 128
    pme.refresh_calculators()
    pme_fixed = ADMPPmeForce(
        box, sysd["axis_types"], sysd["axis_indices"], sysd["covalent_map"],
        rc, ethresh, lmax=2, lpol=False,
        config=EngineConfig(cache_influence=True, pairs_i_sorted=True),
    )
    pme_fixed.K3 = 128
    pme_fixed.refresh_calculators()

    u0, _, _ = pme.optimize_Uind(
        positions, box, pairs, q_local, pol, tholes, scales, scales, scales,
    )
    u0 = u0.astype(jnp.float32)

    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.005 * rng.standard_normal((n, 3)),
                        dtype=jnp.float32)
    n_inner = 10
    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    def timeit(name, make_body, carry0):
        @jax.jit
        def loop(c):
            return jax.lax.scan(make_body(), c, None, length=n_inner)

        out = loop(carry0)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = loop(carry0)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{name:46s} {ms:7.2f} ms/step")
        return ms

    # 1. fixed-multipole e+g
    vg_fixed = jax.value_and_grad(
        lambda p: pme_fixed.get_energy(p, box, pairs, q_local, scales)
    )

    def body_fixed():
        def body(p, _):
            e, f = vg_fixed(p)
            return p + drift + 0.0 * f, e
        return body

    timeit("fixed-multipole e+g (lpol=False)", body_fixed, positions)

    # 2. frozen-dipole e+g: one full pipeline pass at fixed u
    vg_frozen = jax.value_and_grad(
        lambda p, u: pme.energy_fn(
            p, box, pairs, q_local, u, pol, tholes, scales, scales, scales
        )
    )

    def body_frozen():
        def body(carry, _):
            p, u = carry
            e, f = vg_frozen(p, u)
            return (p + drift + 0.0 * f, u), e
        return body

    timeit("frozen-dipole e+g (one full pass)", body_frozen,
           (positions, u0))

    # 3. field(u0) build alone (the solver's r0 unit)
    def body_field():
        def body(carry, _):
            p, u = carry
            fld = pme.grad_U_fn(
                p, box, pairs, q_local, u, pol, tholes,
                scales, scales, scales,
            )
            return (p + drift + 0.0 * fld, u), jnp.sum(fld)
        return body

    timeit("field(u0) build (r0 unit)", body_field, (positions, u0))

    # 4. one u-quadratic matvec (the warm PCG iteration unit)
    from admp_tpu.models.pme import make_induced_quadratic_energy

    mv_grid = (48, 48, 128)
    import dataclasses as _dc
    scfc = cfg.scf
    mv_cfg = (_dc.replace(cfg, spread_order=scfc.matvec_spread_order)
              if scfc.matvec_spread_order is not None else cfg)
    e_uu = make_induced_quadratic_energy(
        jnp.asarray(sysd["covalent_map"]), pme.kappa, mv_grid, mv_cfg,
        static_box=box,
    )
    g_uu = jax.grad(e_uu, argnums=3)

    def body_matvec():
        def body(carry, _):
            p, u = carry
            av = g_uu(p, box, pairs, u, pol, tholes, scales)
            return (p + drift, u + 0.0 * av), jnp.sum(av)
        return body

    timeit("u-quadratic matvec (1x, reduced grid)", body_matvec,
           (positions, u0))

    # 5. SCF solve alone (warm, drifting)
    def body_scf():
        def body(carry, _):
            p, u = carry
            u_new, conv, n_it = pme.optimize_Uind(
                p, box, pairs, q_local, pol, tholes, scales, scales, scales,
                U_init=u,
            )
            return (p + drift, u_new), n_it
        return body

    timeit("SCF solve (warm, drifting)", body_scf, (positions, u0))

    # 6. full polarizable value_grad (the bench primary)
    vga = pme._value_grad_aux

    def body_full():
        def body(carry, _):
            p, u = carry
            (e, (u_new, _c, _n)), f = vga(
                p, box, pairs, q_local, pol, tholes,
                scales, scales, scales, u,
            )
            return (p + drift + 0.0 * f, u_new), e
        return body

    timeit("FULL polarizable e+g (bench primary)", body_full,
           (positions, u0))

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
