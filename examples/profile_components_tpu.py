#!/usr/bin/env python
"""Component-level TPU profile of the water_1024 full-FF step.

Each component is timed in its own scan loop with drifting positions
(hoist-proof: loop-invariant bodies get hoisted by XLA and time as ~0) and
with a force (grad) where the production step pays one. Writes
examples/profile_components_tpu.out.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).with_suffix(".out")
KAPPA = 0.657065221219616


def main():
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
    from admp_tpu.settings import EngineConfig
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

    pme = ADMPPmeForce(
        box, s.axis_types, s.axis_indices, s.covalent_map, 4.0, 1e-4, lmax=2,
        config=EngineConfig(cache_influence=True),
    )
    pme.update_env("kappa", KAPPA)
    disp = ADMPDispPmeForce(
        box, s.covalent_map, 4.0, 1e-4, pmax=10,
        config=EngineConfig(disp_ethresh=2e-4, disp_spread_order=4,
                            cache_influence=True),
    )
    disp.kappa = KAPPA
    disp.K1 = disp.K2 = disp.K3 = 128  # bench grid (even; see ROADMAP odd-K note)
    disp.refresh_calculators()
    tt = generate_pairwise_interaction(tt_damping_qq_c6_kernel, s.covalent_map)

    from admp_tpu.models.pme import pme_real_energy
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import rot_local2global
    from admp_tpu.ops.reciprocal import spread_to_mesh, spectrum_sq
    from admp_tpu.ops.selfenergy import pme_self_energy

    axis_types = jnp.asarray(s.axis_types)
    axis_indices = jnp.asarray(s.axis_indices)
    cov = jnp.asarray(s.covalent_map)
    grid = (pme.K1, pme.K2, pme.K3)

    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.0005 * rng.standard_normal(positions.shape),
                        dtype=jnp.float32)
    pos32 = positions.astype(jnp.float32)
    n_inner = 10

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    def timeit(name, fn_of_pos, grad=True):
        f = jax.value_and_grad(fn_of_pos) if grad else fn_of_pos

        @jax.jit
        def loop(p):
            def body(p, _):
                out = f(p)
                e = out[0] if grad else out
                dp = out[1] if grad else 0.0
                return p + drift + 0.0 * dp, e
            return jax.lax.scan(body, p, None, length=n_inner)

        out = loop(pos32)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = loop(pos32)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{name:42s} {ms:7.2f} ms/step")
        return ms

    # rotation stage only
    def rot_energy(pos):
        frames = construct_local_frames(pos, box, axis_types, axis_indices)
        qg = rot_local2global(q_local, frames, 2)
        return jnp.sum(qg * qg)

    # real space (incl. frames/rot; subtract the stage above)
    def real_energy(pos):
        frames = construct_local_frames(pos, box, axis_types, axis_indices)
        qg = rot_local2global(q_local, frames, 2)
        return pme_real_energy(pos, box, pairs, qg, None, None, None,
                               m_scales, None, cov, KAPPA, 2, False)

    # spread forward only (no FFT): sum of mesh squares as a stand-in reducer
    def spread_only(pos):
        frames = construct_local_frames(pos, box, axis_types, axis_indices)
        qg = rot_local2global(q_local, frames, 2)
        mesh = spread_to_mesh(pos, box, qg, grid, 2)
        return jnp.sum(mesh * mesh)

    # full reciprocal (spread + FFT + influence + Parseval), cached influence
    def recip_energy(pos):
        frames = construct_local_frames(pos, box, axis_types, axis_indices)
        qg = rot_local2global(q_local, frames, 2)
        return pme.pme_recip(pos, box, qg)

    have_recip = hasattr(pme, "pme_recip")

    timeit("frames+rotation (e+g)", rot_energy)
    timeit("real space e+g (incl frames)", real_energy)
    timeit("electro spread fwd+adjoint (incl frames)", spread_only)
    if have_recip:
        timeit("electro recip e+g (incl frames)", recip_energy)
    timeit("electro PME total e+g",
           lambda p: pme.get_energy(p, box, pairs, q_local, m_scales))
    timeit("dispersion PME e+g (order4 K=128)",
           lambda p: disp.get_energy(p, box, pairs, c_j, m_scales))
    timeit("TT short range e+g",
           lambda p: tt(p, box, pairs, m_scales, a_j, b_j, qt_j, c_j[:, 0]))

    def total_energy(pos):
        e = pme.get_energy(pos, box, pairs, q_local, m_scales)
        e = e + disp.get_energy(pos, box, pairs, c_j, m_scales)
        e = e + tt(pos, box, pairs, m_scales, a_j, b_j, qt_j, c_j[:, 0])
        return e

    timeit("FULL force-field e+g", total_energy)

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
