#!/usr/bin/env python
"""Forward-spread stage split at 98k/K=256 (TPU).

recip_98k_tpu.out puts the forward spread at ~112 ms while the kernel's
arithmetic estimate is ~25-40 ms; this isolates the stages — weight
pipeline, bucketing (argsort + searchsorted + row-takes), kernel, folds —
to find the real distribution. Writes examples/spreadfwd_98k_tpu.out.
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

    from admp_tpu import convert_cart2harm
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import rot_local2global
    from admp_tpu.ops import reciprocal as R
    from admp_tpu.ops.pallas import spread as sp
    from admp_tpu.systems import water_system

    grid = (256, 256, 256)
    nx, ny = sp.pick_blocks_2d(grid, 6, 1, 98304)
    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    n = s["positions"].shape[0]
    box = jnp.asarray(s["box"], dtype=jnp.float32)
    pos = jnp.asarray(s["positions"], dtype=jnp.float32)
    q_local = convert_cart2harm(jnp.asarray(s["q_cart"]), 2).astype(
        jnp.float32
    )
    frames = construct_local_frames(
        pos, box, jnp.asarray(s["axis_types"]), jnp.asarray(s["axis_indices"])
    )
    qg = rot_local2global(q_local, frames, 2)

    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)),
                        dtype=jnp.float32)
    n_inner = 3
    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    emit(f"grid {grid}, blocks ({nx}, {ny}), {n} atoms")

    def timeit(name, fn_of_pos):
        @jax.jit
        def loop(p):
            def body(p, _):
                out = fn_of_pos(p)
                return p + drift + 0.0 * out, out
            return jax.lax.scan(body, p, None, length=n_inner)

        out = loop(pos)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(pos)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{name:44s} {ms:8.2f} ms/step")
        return ms

    def stencil(p):
        m_u0, u0, alpha = R.atom_spread_alpha(p, box, qg, grid, 2)
        return m_u0, R.spread_points_separable(u0, alpha, 2, 6)

    # stage 1: spline weight pipeline only (m_u0 + (N, 216) stencil values)
    def weights_only(p):
        m_u0, qpts = stencil(p)
        return jnp.sum(qpts) * 1e-6 + jnp.sum(m_u0) * 0.0

    # stage 2: + bucketing (argsort + searchsorted + row takes), no kernel
    half = 3
    k1, k2, k3 = grid
    wx, wy = k1 // nx, k2 // ny
    nb = nx * ny

    def bucket_only(p):
        m_u0, qpts = stencil(p)
        base = jnp.stack(
            [
                jnp.mod(m_u0[:, 0] - half, k1),
                jnp.mod(m_u0[:, 1] - half, k2),
                jnp.mod(m_u0[:, 2] - half, k3),
            ],
            axis=-1,
        ).astype(jnp.int32)
        bid = (base[:, 0] // wx) * ny + base[:, 1] // wy
        order_ix = jnp.argsort(bid)
        sorted_ids = bid[order_ix]
        q_s = qpts.reshape(n, 6, 36)[order_ix]
        b_iota = jnp.arange(nb, dtype=jnp.int32)
        starts = jnp.searchsorted(sorted_ids, b_iota).astype(jnp.int32)
        cap = min(n, int(np.ceil(n / nb * 2.5)) + 32)
        take = jnp.minimum(
            starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :], n - 1
        )
        q_b = q_s[take]
        m_b = base[order_ix][take]
        return jnp.sum(q_b) * 1e-6 + jnp.sum(m_b) * 0.0

    # stage 3: the full forward spread (kernel + folds on top)
    def full_fwd(p):
        mesh = R.spread_to_mesh(p, box, qg, grid, 2, method="auto")
        return jnp.sum(mesh) * 1e-6

    timeit("weights only (m_u0 + stencil values)", weights_only)
    timeit("+ bucketing (sort/searchsorted/takes)", bucket_only)
    timeit("full forward spread (kernel + folds)", full_fwd)

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
