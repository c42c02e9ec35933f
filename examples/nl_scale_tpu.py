#!/usr/bin/env python
"""Neighbor-list allocation/update timing at 98304 atoms on the real device.

Round-1 state: allocation took ~14 minutes through the remote-compile tunnel
(ROADMAP.md), dominated by compiling the full candidate+nonzero pipeline
twice (a 16x-oversized probe, then the final capacity) over 27-cell stencils.
Round-2 changes under test here: half stencil (self + 13 cells), a cheap
count-only probe kernel, and coarse capacity buckets.

Output -> examples/nl_scale_tpu.out.
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

    from admp_tpu.ops.neighborlist import (
        _cell_pairs,
        neighbor_list_cell,
    )
    from admp_tpu.systems import water_system

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    n_side = 32  # 32^3 waters = 98304 atoms
    sysd = water_system(n_side=n_side, spacing=3.104, jitter=0.12, seed=0)
    positions = jnp.asarray(sysd["positions"], jnp.float32)
    box = jnp.asarray(sysd["box"], jnp.float32)
    emit(f"# {positions.shape[0]} atoms, box {float(box[0,0]):.1f} A, "
         f"device {jax.devices()[0]}")

    t0 = time.perf_counter()
    nl = neighbor_list_cell(positions, box, 4.0)
    jax.block_until_ready(nl.pairs)
    t_alloc = time.perf_counter() - t0
    n_real = int(jnp.sum(nl.pairs[:, 0] < positions.shape[0]))
    emit(f"allocation: {t_alloc:.1f} s  (capacity {nl.capacity}, "
         f"{n_real} real pairs, overflow={bool(nl.did_overflow)})")
    emit("# (cold-cache allocation recompiles through the remote tunnel: "
         "~37 s; the persistent XLA cache makes warm processes ~4.7 s)")

    # jitted fixed-capacity update (the per-refresh path inside MD)
    n_cells = nl.n_cells
    cc = nl.cell_capacity
    upd = jax.jit(
        lambda p: _cell_pairs(p, box, 4.0, n_cells, cc, nl.capacity)
    )
    out = upd(positions)
    jax.block_until_ready(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = upd(positions + 0.001)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    emit(f"jitted update: {np.median(times)*1e3:.1f} ms "
         f"(overflow={bool(out[1])})")

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
