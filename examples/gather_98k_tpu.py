#!/usr/bin/env python
"""Spread-adjoint gather strategies at the 98k/K=320 scale (TPU).

The recip e+g profile (examples/recip_98k_tpu.out) attributes ~345 ms of the
539 ms reciprocal step to the spread backward: a flat 1-D gather of
98304 x 216 stencil values from the 131 MB mesh. This measures the gather
variants in isolation, plus the forward preprocessing (argsort/bucket) cost,
to pick the production adjoint. Writes examples/gather_98k_tpu.out.
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

    from admp_tpu.systems import water_system
    from admp_tpu.ops.reciprocal import mesh_coordinates

    k1 = k2 = k3 = 320
    order = 6
    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    n = s["positions"].shape[0]
    pos = jnp.asarray(s["positions"], dtype=jnp.float32)
    box = jnp.asarray(s["box"], dtype=jnp.float32)

    rng = np.random.default_rng(0)
    g_mesh = jnp.asarray(
        rng.standard_normal((k1, k2, k3)), dtype=jnp.float32
    )
    drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)),
                        dtype=jnp.float32)
    n_inner = 3

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

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
        emit(f"{name:46s} {ms:8.2f} ms/step")
        return ms

    def m_u0_of(p):
        # integer mesh base point of each atom (same as the spread pipeline)
        return mesh_coordinates(p, box, (k1, k2, k3))[0]

    half = order // 2
    offs = jnp.arange(-half, half)

    def flat_idx(m_u0):
        i1 = jnp.mod(m_u0[:, 0:1] + offs[None], k1)
        i2 = jnp.mod(m_u0[:, 1:2] + offs[None], k2)
        i3 = jnp.mod(m_u0[:, 2:3] + offs[None], k3)
        return (
            (i1[:, :, None, None] * k2 + i2[:, None, :, None]) * k3
            + i3[:, None, None, :]
        ).reshape(-1)

    # 1. current production adjoint: flat gather, atom order as given
    def flat_gather(p):
        m = m_u0_of(p)
        g = g_mesh.reshape(-1)[flat_idx(m)].reshape(n, order, order, order)
        return jnp.sum(g) * 1e-6

    # 2. block-sorted flat gather (reuse the forward's (32, 8)-block sort):
    #    indices arrive nearly sorted -> sequential HBM access
    nx, ny = 32, 8
    wx, wy = k1 // nx, k2 // ny

    def sorted_gather(p):
        m = m_u0_of(p)
        base = jnp.stack(
            [jnp.mod(m[:, 0] - half, k1), jnp.mod(m[:, 1] - half, k2)],
            axis=-1,
        )
        bid = (base[:, 0] // wx) * ny + base[:, 1] // wy
        order_ix = jnp.argsort(bid)
        m_s = m[order_ix]
        g = g_mesh.reshape(-1)[flat_idx(m_s)].reshape(
            n, order, order, order
        )
        g = jnp.zeros_like(g).at[order_ix].set(g)  # unsort
        return jnp.sum(g) * 1e-6

    # 3. z-row gather: one gathered slice per (x, y) stencil row (36 rows of
    #    6 contiguous z values; z-wrap handled by a z-padded mesh copy).
    #    lax.gather: operand (K1, K2, K3pad), starts (N*36, 3), slice
    #    (1, 1, order)
    g_pad = jnp.concatenate([g_mesh, g_mesh[:, :, :order]], axis=-1)
    def row_gather2(p):
        m = m_u0_of(p)
        i1 = jnp.mod(m[:, 0:1] + offs[None], k1)
        i2 = jnp.mod(m[:, 1:2] + offs[None], k2)
        z0 = jnp.mod(m[:, 2] - half, k3)
        starts = jnp.stack(
            [
                jnp.broadcast_to(i1[:, :, None], (n, order, order)),
                jnp.broadcast_to(i2[:, None, :], (n, order, order)),
                jnp.broadcast_to(z0[:, None, None], (n, order, order)),
            ],
            axis=-1,
        ).reshape(n * order * order, 3)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,),
            collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1, 2),
        )
        g = jax.lax.gather(
            g_pad, starts, dn, slice_sizes=(1, 1, order),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(n, order, order, order)
        return jnp.sum(g) * 1e-6

    # 4. forward-preprocessing costs for context
    def sort_only(p):
        m = m_u0_of(p)
        bid = (jnp.mod(m[:, 0] - half, k1) // wx) * ny + (
            jnp.mod(m[:, 1] - half, k2) // wy
        )
        return jnp.sum(jnp.argsort(bid)) * 1e-9

    timeit("flat gather (production adjoint)", flat_gather)
    timeit("block-sorted flat gather + unsort", sorted_gather)
    timeit("z-row lax.gather (slice size 6)", row_gather2)
    timeit("argsort(block id) alone", sort_only)

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
