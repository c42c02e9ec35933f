#!/usr/bin/env python
"""Sub-component profile of the K=320 reciprocal pipeline at 98k atoms, plus
a K=256 grid variant (bench-methodology grid reduction: electro_tuning showed
K 17% under the heuristic stays below the f32 working floor at water_1024;
this measures the same trade at the 98k scale). Writes
examples/recip_98k_tpu.out.
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
    from admp_tpu.models.pme import ADMPPmeForce
    from admp_tpu.ops.exclusions import build_sparse_exclusions
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import rot_local2global
    from admp_tpu.ops.reciprocal import make_pme_recip, spread_to_mesh
    from admp_tpu.ops.influence import ck_1
    from admp_tpu.systems import water_system
    from admp_tpu.utils.constants import DIELECTRIC

    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    n = s["positions"].shape[0]
    nmol = n // 3
    bonds = [(3 * m, 3 * m + h) for m in range(nmol) for h in (1, 2)]
    exclusions = build_sparse_exclusions(bonds, n, max_depth=6)
    box = jnp.asarray(s["box"])
    pos0 = jnp.asarray(s["positions"], dtype=jnp.float32)
    q_local = convert_cart2harm(jnp.asarray(s["q_cart"]), 2)
    axis_types = jnp.asarray(s["axis_types"])
    axis_indices = jnp.asarray(s["axis_indices"])

    force = ADMPPmeForce(
        box, s["axis_types"], s["axis_indices"], exclusions,
        4.0, 1e-4, lmax=2, fft_friendly_grid=True,
    )
    kappa = force.kappa
    print(f"heuristic grid ({force.K1},{force.K2},{force.K3}), kappa {kappa}")

    frames = construct_local_frames(pos0, box, axis_types, axis_indices)
    qg = rot_local2global(q_local.astype(jnp.float32), frames, 2)

    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)),
                        dtype=jnp.float32)
    n_inner = 3

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    def timeit(name, fn_of_pos, grad=True):
        f = jax.value_and_grad(fn_of_pos) if grad else fn_of_pos

        @jax.jit
        def loop(p):
            def body(p, _):
                out = f(p)
                e = out[0] if grad else out
                dp = out[1] if grad else 0.0
                return p + drift + 0.0 * dp, e
            return jax.lax.scan(body, p, None, length=n_inner)

        t0 = time.time()
        out = loop(pos0)
        jax.block_until_ready(out)
        tc = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(pos0)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{name:46s} {ms:8.2f} ms/step  (compile {tc:.0f}s)")
        return ms

    for grid in ((320, 320, 320), (256, 256, 256)):
        recip = make_pme_recip(
            ck_1, kappa, include_gamma=False, grid_shape=grid, lmax=2,
            prefactor=DIELECTRIC, spread_method="auto",
        )

        def recip_e(p, recip=recip):
            return recip(p, box, qg)

        # spread only: forward mesh build (kernel + fold + preprocessing),
        # energy = sum(mesh^2) so the grad exercises the gather adjoint too
        def spread_eg(p, grid=grid):
            mesh = spread_to_mesh(p, box, qg, grid, 2, method="auto")
            return jnp.sum(mesh * mesh)

        emit(f"--- grid {grid} ---")
        timeit("recip e only (no force)", recip_e, grad=False)
        timeit("recip e+g", recip_e)
        timeit("spread fwd only (sum mesh^2, no grad)", spread_eg, grad=False)
        timeit("spread fwd + gather adjoint", spread_eg)

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
