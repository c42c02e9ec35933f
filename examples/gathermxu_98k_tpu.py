#!/usr/bin/env python
"""Spread-adjoint attack (round-4 VERDICT item 6): block-resident Pallas
gather with ONE unaligned (6, 6, _ZW) window load per atom + MXU one-hot
z-contraction, vs the production row-gather path (36.75 ms at 98k/K=256,
15% of its HBM bound, per-row-op bound at ~10-14 ns/row).

The one-hot pick-reduce windowed kernel loses because its per-atom
arithmetic is ~600k VPU ops; the MXU variant cuts that ~20x. Rows:

  row-gather (production, K3 %% 128)   — the 36-row/atom XLA path
  windowed one-hot kernel              — round-3 baseline (was 86.3 ms)
  windowed MXU kernel (this round)     — the item-6 attempt

All bitwise-vs-flat-gather checked on-device first. Writes
examples/gathermxu_98k_tpu.out.
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
    from admp_tpu.systems import water_system

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    pos = np.asarray(s["positions"], np.float32)
    n = pos.shape[0]
    K = 256
    grid = (K, K, K)
    # realistic base indices from the actual positions
    box_l = float(s["box"][0, 0])
    m_u0 = jnp.asarray(
        np.mod((pos / box_l * K).astype(np.int64), K), jnp.int32
    )
    rng = np.random.default_rng(0)
    g_mesh = jnp.asarray(
        rng.standard_normal((1, K, K, K)), jnp.float32
    )
    emit(f"system: {n} atoms, grid {grid}")

    # correctness gate on-device: a RANDOM subset (the first 2048 lattice
    # atoms are spatially concentrated and overflow the 8x8 buckets — the
    # impl's overflow flag must be checked when calling it directly)
    sub = m_u0[jnp.asarray(rng.choice(n, 2048, replace=False), jnp.int32)]
    ref = sp._flat_gather(sub, g_mesh, grid, 6)
    for name, fn in (
        ("row-gather", lambda m: (sp._row_gather_impl(m, g_mesh, grid, 6),
                                  False)),
        ("win-onehot", lambda m: sp._pallas_gather2d_impl(
            m, g_mesh, grid, 8, 8, order=6)),
        ("win-mxu", lambda m: sp._pallas_gather2d_impl(
            m, g_mesh, grid, 8, 8, order=6, variant="mxu")),
    ):
        got, ovf = fn(sub)
        assert not bool(jnp.any(jnp.asarray(ovf))), f"{name} bucket overflow"
        d = float(jnp.max(jnp.abs(got - ref)))
        emit(f"gate {name}: max abs diff vs flat = {d:.3e}")
        assert d < 1e-6, name

    drift = jnp.asarray(rng.standard_normal((n, 3)) * 0, jnp.float32)
    n_inner = 3

    def timeit(name, fn):
        @jax.jit
        def loop(m):
            def body(m, _):
                out = fn(m)
                consume = jnp.sum(out * out) * 1e-9
                # rotate bases so nothing hoists; values stay in-range
                m2 = jnp.mod(m + 1, K)
                return m2, consume
            return jax.lax.scan(body, m, None, length=n_inner)

        out = loop(m_u0)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(m_u0)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{name:44s} {ms:8.2f} ms")
        return ms

    timeit("row-gather (production)",
           lambda m: sp._row_gather_impl(m, g_mesh, grid, 6))
    # FULL-shape correctness gates: a degenerate executable from a corrupted
    # remote compile times ~0 ms and is only catchable by checking the
    # timed shape's OUTPUT (observed twice this round after compile-helper
    # crashes). row-gather is bitwise-equal to the flat gather by
    # construction, so it serves as the 98k oracle.
    ref_full = sp._row_gather_impl(m_u0, g_mesh, grid, 6)
    for nx, ny in ((8, 8), (16, 8)):
        for variant in ("onehot", "mxu"):
            got, ovf = sp._pallas_gather2d_impl(
                m_u0, g_mesh, grid, nx, ny, order=6, variant=variant
            )
            assert not bool(ovf), f"({nx},{ny}) bucket overflow at 98k"
            d = float(jnp.max(jnp.abs(got - ref_full)))
            emit(f"98k gate {variant} ({nx}x{ny}): max abs diff {d:.3e}")
            assert d < 1e-6, f"{variant} ({nx},{ny}) WRONG at 98k shape"
        timeit(f"windowed one-hot kernel ({nx}x{ny})",
               lambda m, nx=nx, ny=ny: sp._pallas_gather2d_impl(
                   m, g_mesh, grid, nx, ny, order=6)[0])
        timeit(f"windowed MXU kernel ({nx}x{ny})",
               lambda m, nx=nx, ny=ny: sp._pallas_gather2d_impl(
                   m, g_mesh, grid, nx, ny, order=6, variant="mxu")[0])

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
