#!/usr/bin/env python
"""A/B the spread-kernel atom interleave (1 vs 2 atoms per iteration).

The round-4 roofline (examples/roofline_98k_tpu.out) shows the 98k/K=256
forward spread running AT its dependent-chain VPU bound (101.6%) — issue
latency, not throughput — after the MXU-dot and wide-FMA combine A/Bs both
failed to move it. SPREAD_INTERLEAVE=2 processes a PAIR of atoms per
fori_loop iteration inside one predicated region (independent combine
chains for the VLIW scheduler to interleave; bitwise-equal output). VERDICT (committed .out): SPLIT — the 2-D kernel wins with 2
(98k forward 50.6 -> 43.3 ms), the 1-D slab kernel loses (3000-atom
8.6 -> 9.6) — adopted per kernel (SPREAD_INTERLEAVE_1D=1 / _2D=2). The
flags are read at trace time, so this driver measures ONE variant per
process (it forces BOTH kernels to the chosen value):

    ADMP_TPU_DRIVER_ILV=1 python examples/spreadilv_98k_tpu.py
    ADMP_TPU_DRIVER_ILV=2 python examples/spreadilv_98k_tpu.py

Appends to examples/spreadilv_98k_tpu.out.
"""

import os
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

    ilv = int(os.environ.get("ADMP_TPU_DRIVER_ILV", "2"))
    sp.SPREAD_INTERLEAVE_1D = ilv
    sp.SPREAD_INTERLEAVE_2D = ilv

    lines = [f"variant: interleave={ilv}"]

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    def setup(n_side):
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
        rng = np.random.default_rng(1)
        drift = jnp.asarray(
            0.0005 * rng.standard_normal((n, 3)), dtype=jnp.float32
        )
        return pos, box, qg, drift, n

    n_inner = 3

    def timeit(name, fn_of_pos, pos, drift):
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
        emit(f"{name:40s} {ms:8.2f} ms/step")
        return ms

    # 3072-class / K=128 (1-D slab kernel)
    grid2 = (128, 128, 128)
    pos2, box2, qg2, drift2, _ = setup(10)

    def fwd2(p):
        mesh = R.spread_to_mesh(p, box2, qg2, grid2, 2, method="auto")
        return jnp.sum(mesh) * 1e-6

    emit(f"3000 atoms, grid {grid2}")
    timeit("forward spread", fwd2, pos2, drift2)

    # on-device accuracy gate: kernel path vs XLA scatter on the same inputs
    mesh_k = R.spread_to_mesh(pos2, box2, qg2, grid2, 2, method="auto")
    mesh_s = R.spread_to_mesh(pos2, box2, qg2, grid2, 2, method="scatter")
    scale = float(jnp.max(jnp.abs(mesh_s)))
    diff = float(jnp.max(jnp.abs(mesh_k - mesh_s)))
    emit(f"kernel-vs-scatter max abs diff {diff:.3e} (scale {scale:.3e})")
    assert diff <= 1e-5 * scale, "interleave accuracy gate failed"

    if os.environ.get("ADMP_TPU_DRIVER_SKIP98", "0") == "1":
        with OUT.open("a") as f:
            f.write("\n".join(lines) + "\n\n")
        emit(f"# appended to {OUT} (98k section skipped)")
        return

    # 98k / K=256 (2-D kernel)
    grid = (256, 256, 256)
    pos, box, qg, drift, n = setup(32)

    def fwd(p):
        mesh = R.spread_to_mesh(p, box, qg, grid, 2, method="auto")
        return jnp.sum(mesh) * 1e-6

    emit(f"98k atoms, grid {grid}")
    timeit("forward spread", fwd, pos, drift)

    def eg(p):
        def f(pp):
            mesh = R.spread_to_mesh(pp, box, qg, grid, 2, method="auto")
            return jnp.sum(mesh * mesh)  # LIVE cotangent (bench.py rule)
        return jax.value_and_grad(f)(p)[1]

    timeit("spread e+g (live cotangent)", eg, pos, drift)

    with OUT.open("a") as f:
        f.write("\n".join(lines) + "\n\n")
    emit(f"# appended to {OUT}")


if __name__ == "__main__":
    main()
