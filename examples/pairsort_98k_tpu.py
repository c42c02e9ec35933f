#!/usr/bin/env python
"""Sorted-pair backward-gather probe at 98k atoms (TPU).

neighbor_list_cell now emits i-sorted pair lists; EngineConfig.pairs_i_sorted
lets the i-side backward of the pair-table gathers run as a sorted
segment-sum instead of a random scatter-add (the two row scatter-add
transposes were the ~50 ms residual of the fused-pair-kernel real-space pass,
ROADMAP round-3 continuation 5). This times the production real-space e+g
with the hint off/on, plus the full fluctuating-multipole step with it on.
Writes examples/pairsort_98k_tpu.out.
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
    from admp_tpu.models.pme import ADMPPmeForce, pme_real_energy
    from admp_tpu.ops.exclusions import build_sparse_exclusions
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import rot_local2global
    from admp_tpu.settings import EngineConfig
    from admp_tpu.systems import water_system

    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    n = s["positions"].shape[0]
    nmol = n // 3
    bonds = [(3 * m, 3 * m + h) for m in range(nmol) for h in (1, 2)]
    exclusions = build_sparse_exclusions(bonds, n, max_depth=6)

    t0 = time.time()
    nlist = neighbor_list_cell(s["positions"], s["box"], 4.0)
    pairs = jnp.asarray(nlist.pairs)
    assert nlist.i_sorted
    print(f"{n} atoms, {nlist.capacity} pair capacity "
          f"({time.time()-t0:.1f}s alloc)", flush=True)

    box = jnp.asarray(s["box"])
    pos0 = jnp.asarray(s["positions"], dtype=jnp.float32)
    q_cart0 = jnp.asarray(s["q_cart"])
    m_scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])

    force = ADMPPmeForce(
        box, s["axis_types"], s["axis_indices"], exclusions,
        4.0, 1e-4, lmax=2,
        config=EngineConfig(fft_friendly_grid=True, pairs_i_sorted=True),
    )
    force.K1 = force.K2 = force.K3 = 256
    force.refresh_calculators()

    axis_types = jnp.asarray(s["axis_types"])
    axis_indices = jnp.asarray(s["axis_indices"])
    q_fixed = convert_cart2harm(q_cart0, 2)

    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)),
                        dtype=jnp.float32)
    n_inner = 3

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

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
        emit(f"{name:46s} {ms:8.2f} ms/step  E={float(out[1][-1]):.1f} "
             f"(compile {tc:.0f}s)")
        return ms

    def real_energy(sorted_hint):
        def fn(p):
            frames = construct_local_frames(p, box, axis_types, axis_indices)
            qg = rot_local2global(q_fixed, frames, 2)
            return pme_real_energy(
                p, box, pairs, qg, None, None, None, m_scales, None,
                exclusions, force.kappa, 2, False, pair_chunk=None,
                pairs_i_sorted=sorted_hint,
            )
        return fn

    timeit("real-space e+g, plain scatter backward", real_energy(False))
    timeit("real-space e+g, sorted segment-sum backward", real_energy(True))

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

    def full_energy(p):
        return force.get_energy(p, box, pairs, fluctuating_q_local(p),
                                m_scales)

    timeit("FULL fluctuating step (sorted hint on)", full_energy)

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
