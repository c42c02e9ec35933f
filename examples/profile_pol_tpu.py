#!/usr/bin/env python
"""Component profile of the polarizable bench workload (primary metric).

Decomposes the 3000-atom polarizable step into: the fixed-multipole-equivalent
energy+force, the SCF solve alone (warm), the u-quadratic matvec, and the full
polarizable value_grad (energy + SCF + implicit-adjoint + forces). Writes
examples/profile_pol_tpu.out.
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

    cfg = EngineConfig(cache_influence=True, scf=SCFConfig())
    pme = ADMPPmeForce(
        box, sysd["axis_types"], sysd["axis_indices"], sysd["covalent_map"],
        rc, ethresh, lmax=2, lpol=True, config=cfg,
    )
    pme_fixed = ADMPPmeForce(
        box, sysd["axis_types"], sysd["axis_indices"], sysd["covalent_map"],
        rc, ethresh, lmax=2, lpol=False, config=cfg,
    )

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

    # 1. fixed-multipole energy+force (what the step costs without lpol)
    vg_fixed = jax.value_and_grad(
        lambda p: pme_fixed.get_energy(p, box, pairs, q_local, scales)
    )

    def body_fixed():
        def body(p, _):
            e, f = vg_fixed(p)
            return p + drift + 0.0 * f, e
        return body

    timeit("fixed-multipole e+g", body_fixed, positions)

    # 2. SCF solve alone (warm-started along drifting positions)
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

    # 3. one u-quadratic matvec (the PCG iteration cost)
    from admp_tpu.models.pme import make_induced_quadratic_energy

    e_uu = make_induced_quadratic_energy(
        jnp.asarray(sysd["covalent_map"]), pme.kappa,
        (pme.K1, pme.K2, pme.K3), cfg,
        static_box=box,
    )
    g_uu = jax.grad(e_uu, argnums=3)

    def body_matvec():
        def body(carry, _):
            p, u = carry
            av = g_uu(p, box, pairs, u, pol, tholes, scales)
            return (p + drift, u + 0.0 * av), jnp.sum(av)
        return body

    timeit("u-quadratic matvec (1x)", body_matvec, (positions, u0))

    # 4. full polarizable value_grad (the bench primary)
    vga = pme._value_grad_aux

    def body_full():
        def body(carry, _):
            p, u = carry
            (e, (u_new, _c, _n)), f = vga(
                p, box, pairs, q_local, pol, tholes,
                scales, scales, scales, u,
            )
            # consume f or XLA DCEs the whole backward pass (see bench.py)
            return (p + drift + 0.0 * f, u_new), e
        return body

    timeit("FULL polarizable e+g (bench primary)", body_full, (positions, u0))

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
