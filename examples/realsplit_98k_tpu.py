#!/usr/bin/env python
"""Real-space stage split at 98k atoms / 1.6M pairs (TPU).

The 98k step is now 268.6 ms with real space the largest component
(113.7 ms e+g, examples/realspace_98k_tpu.out). This isolates the stages to
find the next structural share:
  - packed-table row gathers + their scatter-add transpose alone
  - pair geometry + QI frames + harmonic rotation (e+g)
  - screened coefficients + bilinear contraction on fixed rotated inputs
  - production e+g, energy-only forward, and exclusion-lookup ablation
Writes examples/realsplit_98k_tpu.out.
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

    from admp_tpu import convert_cart2harm, neighbor_list_cell
    from admp_tpu.models.pme import pme_real_energy
    from admp_tpu.ops import realspace
    from admp_tpu.ops.ewald import setup_ewald_parameters
    from admp_tpu.ops.exclusions import (
        build_sparse_exclusions,
        lookup_topology_distance,
        scale_for_distance,
    )
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import rot_local2global
    from admp_tpu.systems import water_system

    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    n = s["positions"].shape[0]
    nmol = n // 3
    bonds = [(3 * m, 3 * m + h) for m in range(nmol) for h in (1, 2)]
    exclusions = build_sparse_exclusions(bonds, n, max_depth=6)
    nlist = neighbor_list_cell(s["positions"], s["box"], 4.0)
    pairs = jnp.asarray(nlist.pairs)
    box = jnp.asarray(s["box"])
    pos0 = jnp.asarray(s["positions"], dtype=jnp.float32)
    q_local = convert_cart2harm(jnp.asarray(s["q_cart"]), 2).astype(
        jnp.float32
    )
    m_scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0], dtype=jnp.float32)
    axis_types = jnp.asarray(s["axis_types"])
    axis_indices = jnp.asarray(s["axis_indices"])
    kappa, _, _, _ = setup_ewald_parameters(4.0, 1e-4, s["box"])
    kappa = jnp.float32(kappa)

    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)),
                        dtype=jnp.float32)
    n_inner = 3

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    emit(f"{pairs.shape[0]} padded pairs, {n} atoms")

    raw_i, raw_j = pairs[..., 0], pairs[..., 1]
    mask = raw_i < raw_j
    i = jnp.minimum(raw_i, n - 1)
    j = jnp.minimum(raw_j, n - 1)

    def qg_of(p):
        frames = construct_local_frames(p, box, axis_types, axis_indices)
        return rot_local2global(q_local, frames, 2)

    qg0 = qg_of(pos0)

    def timeit(name, fn_of_pos, grad=True):
        f = jax.value_and_grad(fn_of_pos) if grad else fn_of_pos

        @jax.jit
        def loop(p):
            def body(p, _):
                if grad:
                    e, dp = f(p)
                    return p + drift + 0.0 * dp, e
                e = f(p)
                return p + drift + 0.0 * e * jnp.ones(3, p.dtype), e
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
        emit(f"{name:44s} {ms:8.2f} ms/step  (compile {tc:.0f}s, "
             f"E={float(out[1][-1]):.4f})")
        return ms

    # 1. packed row gathers + transpose scatter only (q_global held fixed)
    def gathers_only(p):
        packed = jnp.concatenate([p, qg0], axis=1)
        g_i, g_j = packed[i], packed[j]
        return jnp.sum(jnp.where(mask[:, None], g_i - g_j, 0.0)) * 1e-6

    # 2. + geometry + QI frames + rotations (fixed multipoles)
    def qi_only(p):
        r, qi_i, qi_j, _, _ = realspace.qi_pair_components(
            p, box, qg0, i, j, mask, 2, None
        )
        acc = r
        for t in qi_i + qi_j:
            acc = acc + t
        return jnp.sum(jnp.where(mask, acc, 0.0)) * 1e-6

    # 3. full production real-space e+g / e-only (frames+rot included, as
    #    in the production step)
    def real_e(p):
        return pme_real_energy(
            p, box, pairs, qg_of(p), None, None, None, m_scales, None,
            exclusions, kappa, 2, False, pair_chunk=None,
        )

    # 4. production minus the exclusion lookup (mscale pinned to 1)
    def real_e_noexcl(p):
        r, qi_i, qi_j, _, _ = realspace.qi_pair_components(
            p, box, qg_of(p), i, j, mask, 2, None
        )
        coef = realspace.perm_coefficients(
            r, jnp.ones_like(r), kappa, 2
        )
        e = realspace.pair_energy_perm(qi_i, qi_j, coef, 2)
        return jnp.sum(jnp.where(mask, e, 0.0))

    # 5. coefficients+contraction on a fixed QI input (isolates the kernel
    #    math + its adjoint from the geometry): r depends on p only through
    #    a precomputed gather — recomputed here to keep shapes honest
    def coef_contract(p):
        dxp = p[i] - p[j]
        r = jnp.sqrt(jnp.sum(dxp * dxp, -1) + 1.0)
        nbond = lookup_topology_distance(exclusions, i, j)
        mscale = scale_for_distance(m_scales, nbond)
        coef = realspace.perm_coefficients(r, mscale, kappa, 2)
        qi_fix = tuple(qg0[:, k][i] for k in range(9))
        qj_fix = tuple(qg0[:, k][j] for k in range(9))
        e = realspace.pair_energy_perm(qi_fix, qj_fix, coef, 2)
        return jnp.sum(jnp.where(mask, e, 0.0))

    timeit("packed row gathers + scatter transpose", gathers_only)
    timeit("+ geometry + QI + rotations (e+g)", qi_only)
    timeit("coef+contraction, fixed QI inputs (e+g)", coef_contract)
    timeit("production real-space (e+g)", real_e)
    timeit("production real-space (energy only)", real_e, grad=False)
    timeit("production minus exclusion lookup (e+g)", real_e_noexcl)

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
