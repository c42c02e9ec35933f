#!/usr/bin/env python
"""Component-level TPU profile of the 98k-atom fluctuating-multipole step.

Same hoist-proof methodology as profile_components_tpu.py (each component in
its own scan with drifting positions, forces consumed into the carry), at the
scale where the large-grid paths differ: K=256^3 grid (accuracy-validated,
grid_98k_cpu.out), 1.6M-pair cell list, sparse exclusions, 2-D Pallas spread,
fused pair kernel, row-gather adjoint. Writes
examples/profile_98k_tpu.out.

Reference scale context: the reference engine cannot run this system at all
(dense (N,N) covalent map alone would be 38 GB; reference admp/parser.py:462-476).
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

    from admp_tpu import convert_cart2harm, neighbor_list_cell
    from admp_tpu.models.pme import ADMPPmeForce
    from admp_tpu.ops.exclusions import build_sparse_exclusions
    from admp_tpu.systems import water_system

    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    n = s["positions"].shape[0]
    nmol = n // 3
    bonds = [(3 * m, 3 * m + h) for m in range(nmol) for h in (1, 2)]
    exclusions = build_sparse_exclusions(bonds, n, max_depth=6)

    t0 = time.time()
    nlist = neighbor_list_cell(s["positions"], s["box"], 4.0)
    pairs = jnp.asarray(nlist.pairs)
    print(f"{n} atoms, {nlist.capacity} pair capacity "
          f"({time.time()-t0:.1f}s alloc)")

    box = jnp.asarray(s["box"])
    pos0 = jnp.asarray(s["positions"], dtype=jnp.float32)
    q_cart0 = jnp.asarray(s["q_cart"])
    m_scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])

    force = ADMPPmeForce(
        box, s["axis_types"], s["axis_indices"], exclusions,
        4.0, 1e-4, lmax=2, fft_friendly_grid=True,
    )
    # K=256: accuracy-viable at this box (examples/grid_98k_cpu.out) and the
    # grid the production 98k step runs (examples/fluctuating_98k_tpu.out)
    force.K1 = force.K2 = force.K3 = 256
    force.refresh_calculators()
    grid = (force.K1, force.K2, force.K3)

    r0 = 0.9572
    coupling = 0.4

    def fluctuating_q_local(positions):
        o, h1, h2 = positions[0::3], positions[1::3], positions[2::3]
        d1 = jnp.linalg.norm(h1 - o, axis=-1) - r0
        d2 = jnp.linalg.norm(h2 - o, axis=-1) - r0
        q = q_cart0.reshape(nmol, 3, -1)
        q = q.at[:, 0, 0].add(coupling * (d1 + d2))
        q = q.at[:, 1, 0].add(-coupling * d1)
        q = q.at[:, 2, 0].add(-coupling * d2)
        return convert_cart2harm(q.reshape(n, -1), 2)

    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)),
                        dtype=jnp.float32)
    n_inner = 3

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    emit(f"grid {grid}, {pairs.shape[0]} padded pairs, {n} atoms")

    def timeit(name, fn_of_pos):
        f = jax.value_and_grad(fn_of_pos)

        @jax.jit
        def loop(p):
            def body(p, _):
                e, dp = f(p)
                return p + drift + 0.0 * dp, e
            return jax.lax.scan(body, p, None, length=n_inner)

        t0 = time.time()
        out = loop(pos0)
        jax.block_until_ready(out)
        tc = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(pos0)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{name:44s} {ms:8.2f} ms/step  (compile {tc:.0f}s)")
        return ms

    # full production step
    def full_energy(p):
        return force.get_energy(p, box, pairs, fluctuating_q_local(p),
                                m_scales)

    # frozen multipoles (isolates the fluctuating-q generator + its VJP)
    q_fixed = fluctuating_q_local(pos0)

    def frozen_q_energy(p):
        return force.get_energy(p, box, pairs, q_fixed, m_scales)

    # real space only (incl. frames/rot: pme_real_energy takes q_global)
    from admp_tpu.models.pme import pme_real_energy
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import rot_local2global

    axis_types = jnp.asarray(s["axis_types"])
    axis_indices = jnp.asarray(s["axis_indices"])

    def real_energy(p):
        frames = construct_local_frames(p, box, axis_types, axis_indices)
        qg = rot_local2global(q_fixed, frames, 2)
        return pme_real_energy(
            p, box, pairs, qg, None, None, None, m_scales, None,
            exclusions, force.kappa, 2, False, pair_chunk=None,
        )

    # reciprocal only (spread + FFT + influence + Parseval, and adjoint)

    recip = force.pme_recip

    def recip_energy(p):
        frames = construct_local_frames(p, box, axis_types, axis_indices)
        qg = rot_local2global(q_fixed, frames, 2)
        return recip(p, box, qg)

    # frames + rotation alone
    def rot_energy(p):
        frames = construct_local_frames(p, box, axis_types, axis_indices)
        qg = rot_local2global(q_fixed, frames, 2)
        return jnp.sum(qg * qg)

    full = timeit("FULL e+g (fluctuating multipoles)", full_energy)
    timeit("frozen-q e+g (no generator VJP)", frozen_q_energy)
    timeit("real-space e+g (1.6M pairs)", real_energy)
    timeit("reciprocal e+g (spread+FFT+adj)", recip_energy)
    timeit("frames+rotation e+g", rot_energy)

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
