#!/usr/bin/env python
"""Pair-chunk sizing for the 98k real-space pass (TPU).

The production step chunks the 1.6M-pair list through lax.map at 2^18 pairs
per block (models/pme.py energy_pme) to bound per-pair intermediates; the
post-SoA pipeline keeps only (C,)-flat scalars (~50 live arrays x 4 B/pair),
so much larger chunks — or no chunking at all — may now fit and avoid the
serialization. Measures real-space e+g at several chunk sizes. Writes
examples/realspace_98k_tpu.out.
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
    from admp_tpu.models.pme import pme_real_energy
    from admp_tpu.ops.ewald import setup_ewald_parameters
    from admp_tpu.ops.exclusions import build_sparse_exclusions
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import rot_local2global
    from admp_tpu.systems import water_system

    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    n = s["positions"].shape[0]
    nmol = n // 3
    bonds = [(3 * m, 3 * m + h) for m in range(nmol) for h in (1, 2)]
    exclusions = build_sparse_exclusions(bonds, n, max_depth=6)
    nlist = neighbor_list_cell(s["positions"], s["box"], 4.0)
    pairs = jnp.asarray(nlist.pairs)
    box = jnp.asarray(s["box"])
    pos0 = jnp.asarray(s["positions"], dtype=jnp.float32)
    q_local = convert_cart2harm(jnp.asarray(s["q_cart"]), 2).astype(
        jnp.float32
    )
    m_scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0], dtype=jnp.float32)
    axis_types = jnp.asarray(s["axis_types"])
    axis_indices = jnp.asarray(s["axis_indices"])
    kappa, _, _, _ = setup_ewald_parameters(4.0, 1e-4, s["box"])

    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)),
                        dtype=jnp.float32)
    n_inner = 3

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    emit(f"{pairs.shape[0]} padded pairs, {n} atoms")

    def real_energy(p, chunk):
        frames = construct_local_frames(p, box, axis_types, axis_indices)
        qg = rot_local2global(q_local, frames, 2)
        return pme_real_energy(
            p, box, pairs, qg, None, None, None, m_scales, None,
            exclusions, kappa, 2, False, pair_chunk=chunk,
        )

    e_vals = {}
    for chunk in ((1 << 18), (1 << 19), (1 << 20), (1 << 21), None):
        f = jax.value_and_grad(lambda p, c=chunk: real_energy(p, c))

        @jax.jit
        def loop(p):
            def body(p, _):
                e, dp = f(p)
                return p + drift + 0.0 * dp, e
            return jax.lax.scan(body, p, None, length=n_inner)

        name = f"pair_chunk={chunk}"
        try:
            t0 = time.time()
            out = loop(pos0)
            jax.block_until_ready(out)
            tc = time.time() - t0
        except Exception as exc:  # OOM etc. — record and continue
            emit(f"{name:24s} FAILED: {type(exc).__name__}: "
                 f"{str(exc).splitlines()[0][:90]}")
            continue
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(pos0)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        e_vals[name] = float(out[1][-1])
        emit(f"{name:24s} {ms:8.2f} ms/step  (compile {tc:.0f}s, "
             f"E={e_vals[name]:.4f})")

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
