#!/usr/bin/env python
"""DMA-windowed spread kernel probe at 98k/K=256 (TPU).

The forward 2-D Pallas spread previously received its (nb, cap, 216) atom
window through an XLA window take measured at ~88 ns/row (~36 ms of the
46.6 ms forward spread, examples/spreadfwd_98k_tpu.out). The kernel now
DMAs each bucket's contiguous row range from the sorted HBM table itself
(ops/pallas/spread.py::_make_spread_dma_kernel, lane-padded to 128).
This probe measures the forward spread and the e+g composite on the same
workload. Writes examples/spreaddma_98k_tpu.out.
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

    from admp_tpu.ops.pallas import spread as sp

    grid = (256, 256, 256)
    n = 98304
    nx, ny = sp.pick_blocks_2d(grid, 6, 1, n)
    rng = np.random.default_rng(0)
    m_u0 = jnp.asarray(rng.integers(0, 256, (n, 3)), dtype=jnp.int32)
    q_pts = jnp.asarray(rng.standard_normal((n, 216)), dtype=jnp.float32)

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    emit(f"grid {grid}, blocks ({nx}, {ny}), {n} atoms, "
         f"device {jax.devices()[0].platform}")

    n_inner = 3

    @jax.jit
    def fwd_loop(q):
        def body(c, _):
            mesh, ov = sp._pallas_spread2d_impl(
                m_u0, (q + c * 1e-12).reshape(n, 1, 216), grid, nx, ny
            )
            return c + mesh[0, 0, 0, 0] + ov.astype(jnp.float32), 0.0
        c, _ = jax.lax.scan(body, 0.0, None, length=n_inner)
        return c

    t0 = time.perf_counter()
    r = fwd_loop(q_pts)
    r.block_until_ready()
    emit(f"fwd compile+first: {time.perf_counter() - t0:.1f} s (val {r:.4f})")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fwd_loop(q_pts).block_until_ready()
        ts.append((time.perf_counter() - t0) / n_inner * 1e3)
    emit(f"forward spread (DMA kernel): {min(ts):.1f} ms "
         f"[{', '.join(f'{t:.1f}' for t in ts)}]")

    # production path: atoms pre-grouped by bucket (the sorted-materialize
    # gather never exists; this is what the engine runs)
    bid = sp.bucket_id_2d(m_u0, grid, nx, ny)
    order_p = sp.presort_order(bid, nx * ny)
    m_u0_s = m_u0[order_p]
    q_pts_s = q_pts[order_p]

    @jax.jit
    def fwd_sorted_loop(q):
        def body(c, _):
            mesh, ov = sp._pallas_spread2d_impl(
                m_u0_s, (q + c * 1e-12).reshape(n, 1, 216), grid, nx, ny,
                presorted=True,
            )
            return c + mesh[0, 0, 0, 0] + ov.astype(jnp.float32), 0.0
        c, _ = jax.lax.scan(body, 0.0, None, length=n_inner)
        return c

    t0 = time.perf_counter()
    r = fwd_sorted_loop(q_pts_s)
    r.block_until_ready()
    emit(f"fwd presorted compile+first: {time.perf_counter() - t0:.1f} s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fwd_sorted_loop(q_pts_s).block_until_ready()
        ts.append((time.perf_counter() - t0) / n_inner * 1e3)
    emit(f"forward spread presorted (DMA kernel): {min(ts):.1f} ms "
         f"[{', '.join(f'{t:.1f}' for t in ts)}]")

    # e+g composite through spread_blocks_2d (custom_vjp wrapper)
    @jax.jit
    def eg_loop(q):
        def one(qq):
            mesh = sp.spread_blocks_2d(
                m_u0, qq.reshape(n, 6, 6, 6), grid, nx, ny
            )
            return jnp.sum(mesh * mesh)

        def body(c, _):
            e, g = jax.value_and_grad(one)(q + c * 1e-12)
            return c + e * 1e-30 + g[0, 0] * 1e-30, 0.0
        c, _ = jax.lax.scan(body, 0.0, None, length=n_inner)
        return c

    t0 = time.perf_counter()
    r = eg_loop(q_pts)
    r.block_until_ready()
    emit(f"e+g compile+first: {time.perf_counter() - t0:.1f} s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        eg_loop(q_pts).block_until_ready()
        ts.append((time.perf_counter() - t0) / n_inner * 1e3)
    emit(f"spread e+g: {min(ts):.1f} ms [{', '.join(f'{t:.1f}' for t in ts)}]")

    OUT.write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
