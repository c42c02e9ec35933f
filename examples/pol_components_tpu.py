#!/usr/bin/env python
"""Component split of ONE full pipeline pass at the pol-bench config
(3000-atom liquid box, lmax=2+lpol, K=(96,96,128), cache_influence,
pairs_i_sorted). The bench step is two such passes (r0 field + final
energy+backward) + ~2 cheap matvecs (profile_pol2_tpu.out); whatever
dominates the pass dominates the metric. Writes pol_components_tpu.out.
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
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import rot_local2global
    from admp_tpu.ops import reciprocal as R
    from admp_tpu.settings import EngineConfig
    from admp_tpu.systems import water_system
    from admp_tpu.models.pme import pme_real_energy
    from admp_tpu.ops.harmonics import cart_dipole_to_harm

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
    grid = (pme.K1, pme.K2, pme.K3)
    u0, _, _ = pme.optimize_Uind(
        positions, box, pairs, q_local, pol, tholes, scales, scales, scales,
    )
    u0 = u0.astype(jnp.float32)
    axis_types = jnp.asarray(sysd["axis_types"])
    axis_indices = jnp.asarray(sysd["axis_indices"])
    covalent_map = jnp.asarray(sysd["covalent_map"])

    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.005 * rng.standard_normal((n, 3)),
                        dtype=jnp.float32)
    n_inner = 10
    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    emit(f"grid {grid}, {n} atoms, {pairs.shape[0]} pair rows")

    def timeit(name, fn_of_pos):
        @jax.jit
        def loop(p):
            def body(p, _):
                out = fn_of_pos(p)
                return p + drift + 0.0 * out, 0.0
            return jax.lax.scan(body, p, None, length=n_inner)

        out = loop(positions)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = loop(positions)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{name:44s} {ms:7.2f} ms/step")
        return ms

    # frames + rotation only (e-like scalar consumed)
    def frames_only(p):
        fr = construct_local_frames(p, box, axis_types, axis_indices)
        qg = rot_local2global(q_local, fr, 2)
        return jnp.sum(qg) * 1e-6 * jnp.sum(p * 0.0 + 1.0)

    def frames_grad(p):
        return jax.grad(
            lambda pp: jnp.sum(
                rot_local2global(
                    q_local,
                    construct_local_frames(pp, box, axis_types, axis_indices),
                    2,
                ) ** 2
            )
        )(p).sum()

    u_harm = cart_dipole_to_harm(u0)

    # real-space e+g at the polarizable config
    def real_eg(p):
        def e(pp):
            fr = construct_local_frames(pp, box, axis_types, axis_indices)
            qg = rot_local2global(q_local, fr, 2)
            return pme_real_energy(
                pp, box, pairs, qg, u_harm, pol, tholes, scales, scales,
                covalent_map, pme.kappa, 2, True,
                pair_kernel=cfg.pair_kernel, pairs_i_sorted=True,
            )
        ev, g = jax.value_and_grad(e)(p)
        return ev + jnp.sum(g) * 0.0

    # recip e+g (q_tot mesh, the engine's own recip operator)
    def recip_eg(p):
        def e(pp):
            fr = construct_local_frames(pp, box, axis_types, axis_indices)
            qg = rot_local2global(q_local, fr, 2)
            # mirror energy_pme's lpol q_tot composition: dipole channels
            # get the induced dipoles added
            qt = qg.at[:, 1:4].add(u_harm)
            return pme.pme_recip(pp, box, qt)
        ev, g = jax.value_and_grad(e)(p)
        return ev + jnp.sum(g) * 0.0

    # recip forward only
    def recip_fwd(p):
        fr = construct_local_frames(p, box, axis_types, axis_indices)
        qg = rot_local2global(q_local, fr, 2)
        qt = qg.at[:, 1:4].add(u_harm)
        return pme.pme_recip(p, box, qt)

    timeit("frames+rotation fwd", frames_only)
    timeit("frames+rotation grad", frames_grad)
    timeit("real-space e+g (pol pairs)", real_eg)
    timeit("recip fwd (spread+FFT+influence)", recip_fwd)
    timeit("recip e+g", recip_eg)


    # --- appended stages: empty baseline + production component-form path ---
    from admp_tpu.ops.frames import local_frames_components
    from admp_tpu.ops.harmonics import rot_local2global_components

    def empty_body(p):
        return jnp.sum(p) * 1e-9

    def frames_components(p):
        fc = local_frames_components(p, box, axis_types, axis_indices)
        qg = rot_local2global_components(q_local, fc, 2)
        return jnp.sum(qg) * 1e-6

    def frames_components_grad(p):
        return jax.grad(
            lambda pp: jnp.sum(
                rot_local2global_components(
                    q_local,
                    local_frames_components(pp, box, axis_types, axis_indices),
                    2,
                ) ** 2
            )
        )(p).sum()

    timeit("empty scan body", empty_body)
    timeit("frames+rot components fwd (prod path)", frames_components)
    timeit("frames+rot components grad (prod path)", frames_components_grad)

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT} (appended)")


if __name__ == "__main__":
    main()
