#!/usr/bin/env python
"""Row-gather adjoint macro-row probe — CLOSED (measured NEGATIVE, round 4).

Hypothesis: the 36-rows/atom row-gather adjoint is bounded by the per-ROW
~10-14 ns random-access cost, so gathering order CONTIGUOUS
(dx, y0:y0+order, :) macro-rows from a y-extended mesh (6x fewer row ops,
identical bytes, bitwise-equal output) should win.

Verdict (committed .out): 12-20x SLOWER — 98k/K=256 spread e+g 86.6 (rows)
vs 1052 ms (macro, lane-aligned 2-D slices) vs ~1194 ms (flat-1-D unaligned
slices). The TPU gather fast path is strictly one trailing row per index;
multi-row slice_sizes fall off it entirely. The variant was removed from
ops/pallas/spread.py; this driver now re-measures only the production
'rows' path.

Methodology note, recorded because it invalidated this file's first block:
timing "spread e+g" through jnp.sum(mesh) hands the gather a CONSTANT
cotangent that XLA folds away — the loss must be sum(mesh*mesh) (live
cotangent) or the adjoint is dead code (same class of flaw as the round-3
unused-force DCE, CLAUDE.md).
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
    drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)), jnp.float32)
    grid = (256, 256, 256)

    def eg(p):
        def f(pp):
            mesh = R.spread_to_mesh(pp, box, qg, grid, 2, method="auto")
            return jnp.sum(mesh * mesh)  # live cotangent
        return jax.value_and_grad(f)(p)[1]

    @jax.jit
    def loop(p):
        def body(p, _):
            out = eg(p)
            return p + drift + 0.0 * out, 0.0
        return jax.lax.scan(body, p, None, length=3)

    out = loop(pos)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(pos)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts) / 3 * 1e3)
    line = f"98k/K=256 spread e+g (rows adjoint, live cotangent) {ms:8.2f} ms"
    print(line)
    with OUT.open("a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
