#!/usr/bin/env python
"""Row-gather spread adjoint vs the Pallas windowed gather (98k atoms, TPU).

Continuation-3 lesson applied to the spread ADJOINT itself: per-element
random gathers run at ~60-100M elem/s, but gathers of CONTIGUOUS trailing
rows run at memory bandwidth. Each atom's (6, 6, 6) stencil cotangent is 36
(dx, dy) mesh rows; gathering the FULL K3-length rows (1 KB each at K=256)
moves 42x the needed bytes yet rides the fast path, and the 6 z-values are
then extracted with a per-atom one-hot contraction (batched matmul, MXU).
This needs no bucketing, no sort, no capacity/overflow handling — pure XLA.

Measures, at 98304 atoms, K in {256, 320}:
  - production Pallas windowed gather (gather_blocks_2d, auto block choice)
  - full-row gather + one-hot z einsum
  - flat per-element gather (reference floor)
Writes examples/gatherrow_98k_tpu.out.
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
    from admp_tpu.ops.pallas.spread import gather_blocks_2d, pick_blocks_2d

    order = 6
    half = order // 2
    offs = jnp.arange(-half, half)
    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    n = s["positions"].shape[0]
    pos = jnp.asarray(s["positions"], dtype=jnp.float32)
    box = jnp.asarray(s["box"], dtype=jnp.float32)

    rng = np.random.default_rng(0)
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

        t0 = time.perf_counter()
        out = loop(pos)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(pos)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{name:46s} {ms:8.2f} ms/step  (compile {compile_s:.0f}s)")
        return ms

    for k in (256, 320):
        k1 = k2 = k3 = k
        emit(f"--- grid ({k1}, {k2}, {k3}) ---")
        g_mesh = jnp.asarray(
            rng.standard_normal((k1, k2, k3)), dtype=jnp.float32
        )

        def m_u0_of(p):
            return mesh_coordinates(p, box, (k1, k2, k3))[0]

        blocks = pick_blocks_2d((k1, k2, k3), order, 1, n)
        nx, ny = blocks

        def pallas_gather(p):
            m = m_u0_of(p)
            g = gather_blocks_2d(m, g_mesh[None], (k1, k2, k3), order, nx, ny)
            return jnp.sum(g) * 1e-6

        mesh2d = g_mesh.reshape(k1 * k2, k3)
        z_iota = jnp.arange(k3, dtype=jnp.int32)

        def row_gather(p):
            m = m_u0_of(p)
            i1 = jnp.mod(m[:, 0:1] + offs[None], k1)            # (n, 6)
            i2 = jnp.mod(m[:, 1:2] + offs[None], k2)            # (n, 6)
            rid = (i1[:, :, None] * k2 + i2[:, None, :]).reshape(n, 36)
            rows = mesh2d[rid]                                   # (n, 36, k3)
            zt = jnp.mod(m[:, 2:3] - half + jnp.arange(order)[None], k3)
            sel = (zt[:, :, None] == z_iota[None, None, :]).astype(rows.dtype)
            out = jnp.einsum("nrz,nlz->nrl", rows, sel)          # (n, 36, 6)
            return jnp.sum(out) * 1e-6

        def flat_idx(m_u0):
            i1 = jnp.mod(m_u0[:, 0:1] + offs[None], k1)
            i2 = jnp.mod(m_u0[:, 1:2] + offs[None], k2)
            i3 = jnp.mod(m_u0[:, 2:3] + offs[None], k3)
            return (
                (i1[:, :, None, None] * k2 + i2[:, None, :, None]) * k3
                + i3[:, None, None, :]
            ).reshape(-1)

        def flat_gather(p):
            m = m_u0_of(p)
            g = g_mesh.reshape(-1)[flat_idx(m)].reshape(n, 216)
            return jnp.sum(g) * 1e-6

        # correctness gate before timing (jitted, on an atom subset — the
        # full (n, 36, k3) rows array is ~3.6 GB and eager mode OOMs holding
        # duplicate buffers)
        @jax.jit
        def _check(p):
            m0 = m_u0_of(p)[:4096]
            ns = m0.shape[0]
            ref = g_mesh.reshape(-1)[
                flat_idx(m0).reshape(ns, 216)
            ].reshape(ns, 216)
            i1 = jnp.mod(m0[:, 0:1] + offs[None], k1)
            i2 = jnp.mod(m0[:, 1:2] + offs[None], k2)
            rid = (i1[:, :, None] * k2 + i2[:, None, :]).reshape(ns, 36)
            rows = mesh2d[rid]
            zt = jnp.mod(m0[:, 2:3] - half + jnp.arange(order)[None], k3)
            sel = (zt[:, :, None] == z_iota[None, None, :]).astype(rows.dtype)
            got = jnp.einsum("nrz,nlz->nrl", rows, sel).reshape(ns, 216)
            return jnp.max(jnp.abs(got - ref))

        err = float(_check(pos))
        emit(f"row-gather max abs err vs flat (4096 atoms): {err:.2e}")
        assert err == 0.0, err

        n_chunk = 8192

        def row_gather_chunked(p):
            m = m_u0_of(p)

            def one(mc):
                nc = mc.shape[0]
                i1 = jnp.mod(mc[:, 0:1] + offs[None], k1)
                i2 = jnp.mod(mc[:, 1:2] + offs[None], k2)
                rid = (i1[:, :, None] * k2 + i2[:, None, :]).reshape(nc, 36)
                rows = mesh2d[rid]
                zt = jnp.mod(
                    mc[:, 2:3] - half + jnp.arange(order)[None], k3
                )
                sel = (zt[:, :, None] == z_iota[None, None, :]).astype(
                    rows.dtype
                )
                return jnp.einsum("nrz,nlz->nrl", rows, sel)

            out = jax.lax.map(one, m.reshape(-1, n_chunk, 3))
            return jnp.sum(out) * 1e-6

        timeit(f"pallas windowed gather ({nx},{ny})", pallas_gather)
        timeit("full-row gather + one-hot z einsum", row_gather)
        timeit(f"row gather, {n_chunk}-atom chunks", row_gather_chunked)
        timeit("flat per-element gather", flat_gather)

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
