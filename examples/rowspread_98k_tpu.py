#!/usr/bin/env python
"""Row-scatter forward spread probe (TPU, 98k/K=256 + water_1024/K=128).

The 2-D Pallas forward spread at 98k/K=256 costs ~52 ms, of which the
bucketing preprocessing (argsort + searchsorted + row takes) is ~47 ms
(spreadfwd_98k_tpu.out) — the kernel math is nearly free. The row-gather
ADJOINT for lane-aligned grids already proved that full-K3-row traffic rides
at memory bandwidth (gatherrow_98k_tpu.out). This probes the mirror for the
FORWARD: expand each atom's 6 z-values into full K3 rows with the same
one-hot z matmul, then ONE row scatter-add of (N*order^2, K3) updates into
the (K1*K2, K3) mesh. No sort, no buckets, no capacity/overflow.

Variants:
  1. current 'auto' forward (pallas2d at K=256, 1-D slab kernel at K=128)
  2. row-scatter: mesh.at[rid].add(rows)
  3. row-scatter, pre-sorted: argsort(rid) + row-permute + sorted segment_sum

Writes examples/rowspread_98k_tpu.out.
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
    from admp_tpu.systems import water_system

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    def run_case(n_side, grid, n_inner):
        order = 6
        k1, k2, k3 = grid
        plane = k1 * k2
        s = water_system(n_side=n_side, spacing=3.104, jitter=0.1, seed=0)
        n = s["positions"].shape[0]
        box = jnp.asarray(s["box"], dtype=jnp.float32)
        pos = jnp.asarray(s["positions"], dtype=jnp.float32)
        q_local = convert_cart2harm(jnp.asarray(s["q_cart"]), 2).astype(
            jnp.float32
        )
        frames = construct_local_frames(
            pos, box, jnp.asarray(s["axis_types"]),
            jnp.asarray(s["axis_indices"]),
        )
        qg = rot_local2global(q_local, frames, 2)
        emit(f"--- grid {grid}, {n} atoms ---")

        rng = np.random.default_rng(1)
        drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)),
                            dtype=jnp.float32)

        half = order // 2
        offs = jnp.arange(-half, half, dtype=jnp.int32)

        def stencil(p):
            m_u0, u0, alpha = R.atom_spread_alpha(p, box, qg, grid, 2)
            return m_u0, R.spread_points_separable(u0, alpha, 2, order)

        def row_pieces(p):
            m_u0, qpts = stencil(p)
            i1 = jnp.mod(m_u0[:, 0:1] + offs[None], k1)
            i2 = jnp.mod(m_u0[:, 1:2] + offs[None], k2)
            rid = (i1[:, :, None] * k2 + i2[:, None, :]).reshape(
                n, order * order
            )
            zt = jnp.mod(m_u0[:, 2:3] + offs[None], k3)
            z_iota = jnp.arange(k3, dtype=jnp.int32)
            sel = (zt[:, :, None] == z_iota[None, None, :]).astype(
                qpts.dtype
            )
            rows = jnp.einsum(
                "nrl,nlz->nrz", qpts.reshape(n, order * order, order), sel
            )
            return rid, rows

        def fwd_auto(p):
            return R.spread_to_mesh(p, box, qg, grid, 2, method="auto")

        def fwd_rowscatter(p):
            rid, rows = row_pieces(p)
            mesh = jnp.zeros((plane, k3), rows.dtype)
            mesh = mesh.at[rid.reshape(-1)].add(
                rows.reshape(-1, k3)
            )
            return mesh.reshape(k1, k2, k3)

        def fwd_rowsorted(p):
            rid, rows = row_pieces(p)
            rid_f = rid.reshape(-1)
            order_ix = jnp.argsort(rid_f)
            mesh = jax.ops.segment_sum(
                rows.reshape(-1, k3)[order_ix], rid_f[order_ix],
                num_segments=plane, indices_are_sorted=True,
            )
            return mesh.reshape(k1, k2, k3)

        def fwd_scatter_xla(p):
            return R.spread_to_mesh(p, box, qg, grid, 2, method="scatter")

        # accuracy: row-scatter vs flat XLA scatter on the same inputs
        m_ref = fwd_scatter_xla(pos)
        m_row = fwd_rowscatter(pos)
        err = float(jnp.max(jnp.abs(m_row - m_ref)) /
                    jnp.max(jnp.abs(m_ref)))
        emit(f"row-scatter max rel err vs flat scatter: {err:.2e}")

        def timeit(name, fn_of_pos):
            @jax.jit
            def loop(p):
                def body(p, _):
                    out = fn_of_pos(p)
                    return p + drift + 0.0 * jnp.sum(out) * 1e-9, 0.0
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
            emit(f"{name:44s} {ms:8.2f} ms/step  (compile {compile_s:.0f}s)")
            return ms

        timeit("forward spread: current auto", fwd_auto)
        timeit("forward spread: row scatter-add", fwd_rowscatter)
        timeit("forward spread: sorted segment_sum", fwd_rowsorted)

    run_case(32, (256, 256, 256), 3)
    run_case(10, (128, 128, 128), 10)

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
