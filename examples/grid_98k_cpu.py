#!/usr/bin/env python
"""Reciprocal-grid accuracy ladder at the 98k scale (CPU, f64).

The OpenMM heuristic picks K=320 for the 99.3 A box at ethresh=1e-4; the
bench methodology (examples/electro_tuning_tpu.out) showed water_1024 can run
17% under the heuristic grid with the force error still below the f32 working
floor (4.3e-4 relative). This measures the same ladder at 98k atoms: recip
forces at K in {256, 288, 320} vs a K=384 f64 oracle, normalized by the
TOTAL force rms of the production step (28.58 kJ/mol/A measured,
examples/fluctuating_98k_tpu.out). Writes examples/grid_98k_cpu.out.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).with_suffix(".out")
F_TOTAL_RMS = 28.5794  # kJ/mol/A, examples/fluctuating_98k_tpu.out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from admp_tpu import convert_cart2harm
    from admp_tpu.ops.ewald import setup_ewald_parameters
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import rot_local2global
    from admp_tpu.ops.influence import ck_1
    from admp_tpu.ops.reciprocal import make_pme_recip
    from admp_tpu.systems import water_system
    from admp_tpu.utils.constants import DIELECTRIC

    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    n = s["positions"].shape[0]
    box = jnp.asarray(s["box"], dtype=jnp.float64)
    pos = jnp.asarray(s["positions"], dtype=jnp.float64)
    q_local = convert_cart2harm(jnp.asarray(s["q_cart"]), 2)
    kappa, k1h, k2h, k3h = setup_ewald_parameters(4.0, 1e-4, s["box"])
    print(f"{n} atoms, heuristic K={k1h}, kappa={kappa:.6f}")

    frames = construct_local_frames(
        pos, box, jnp.asarray(s["axis_types"]), jnp.asarray(s["axis_indices"])
    )
    qg = rot_local2global(q_local.astype(jnp.float64), frames, 2)

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    def recip_forces(k):
        recip = make_pme_recip(
            ck_1, kappa, include_gamma=False, grid_shape=(k, k, k), lmax=2,
            prefactor=DIELECTRIC, spread_method="scatter",
        )

        def e(p):
            return recip(p, box, qg)

        t0 = time.time()
        val, grad = jax.value_and_grad(e)(pos)
        grad = np.asarray(jax.block_until_ready(grad))
        emit(f"  K={k}: E_recip={float(val):.6f} ({time.time()-t0:.0f}s)")
        return grad

    f_ref = recip_forces(384)
    for k in (320, 288, 256):
        f = recip_forces(k)
        d = f - f_ref
        rel = float(np.sqrt(np.mean(d**2)) / F_TOTAL_RMS)
        mx = float(np.max(np.abs(d)) / F_TOTAL_RMS)
        emit(f"K={k}: recip dF rms/|F_total|rms = {rel:.3e}, max {mx:.3e}"
             f"  ({'under' if rel < 4.3e-4 else 'ABOVE'} the f32 floor)")

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
