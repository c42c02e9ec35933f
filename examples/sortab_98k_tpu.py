#!/usr/bin/env python
"""A/B: packed-key jnp.sort vs two-operand argsort in the 2-D spread
bucketing, measured in ONE process at 98k/K=256 (controls the session-to-
session TPU drift that confounded separate runs). Also micro-times the two
sorts alone. Writes examples/sortab_98k_tpu.out."""

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
    q_local = convert_cart2harm(jnp.asarray(s["q_cart"]), 2).astype(jnp.float32)
    frames = construct_local_frames(
        pos, box, jnp.asarray(s["axis_types"]), jnp.asarray(s["axis_indices"])
    )
    qg = rot_local2global(q_local, frames, 2)

    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)), dtype=jnp.float32)
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
        for _ in range(5):
            t0 = time.perf_counter()
            out = loop(pos)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{name:46s} {ms:8.2f} ms/step")
        return ms

    def argsort_bucket(bid, nb, cap):
        nn = bid.shape[0]
        sort_order = jnp.argsort(bid).astype(jnp.int32)
        sorted_ids = bid[sort_order]
        b_iota = jnp.arange(nb, dtype=jnp.int32)
        starts = jnp.searchsorted(sorted_ids, b_iota).astype(jnp.int32)
        ends = jnp.searchsorted(sorted_ids, b_iota + 1).astype(jnp.int32)
        counts = ends - starts
        overflow = jnp.any(counts > cap)
        take = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        take = jnp.minimum(take, nn - 1)
        return sort_order, take, counts, overflow

    packed_bucket = sp._bucket_sort
    impl = sp._pallas_spread2d_impl.__wrapped__

    def full_fwd(p):
        m_u0, u0, alpha = R.atom_spread_alpha(p, box, qg, grid, 2)
        q_points = R.spread_points_separable(u0, alpha, 2, 6)
        mesh, _ = impl(m_u0, q_points.reshape(n, 1, 216), grid, nx, ny)
        return jnp.sum(mesh[0]) * 1e-6

    # sort micro-benchmarks (same bid distribution as production)
    wx, wy = grid[0] // nx, grid[1] // ny
    half = 3

    def make_bid(p):
        m_u0, _, _ = R.atom_spread_alpha(p, box, qg, grid, 2)
        base0 = jnp.mod(m_u0[:, 0] - half, grid[0])
        base1 = jnp.mod(m_u0[:, 1] - half, grid[1])
        return ((base0 // wx) * ny + base1 // wy).astype(jnp.int32)

    def micro_argsort(p):
        bid = make_bid(p)
        return jnp.sum(jnp.argsort(bid).astype(jnp.int32)) * 1e-6

    def micro_packed(p):
        bid = make_bid(p)
        key = jnp.sort(bid * np.int32(1 << 17) + jnp.arange(n, dtype=jnp.int32))
        return jnp.sum(key) * 1e-9

    timeit("micro: argsort(bid)", micro_argsort)
    timeit("micro: sort(packed key)", micro_packed)

    # A: packed-key sort (current production)
    sp._bucket_sort = packed_bucket
    timeit("full fwd, packed-key sort", full_fwd)

    # B: argsort (round-3 original) — re-trace under a fresh jit wrapper
    sp._bucket_sort = argsort_bucket

    def full_fwd_b(p):
        return full_fwd(p) + 0.0

    timeit("full fwd, argsort", full_fwd_b)
    sp._bucket_sort = packed_bucket

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
