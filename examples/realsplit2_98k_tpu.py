#!/usr/bin/env python
"""Finer real-space bisect at 98k (TPU): where do the ~60 ms of QI+rotation
e+g go? Stages add one piece at a time on top of the packed gathers; also
probes jax.checkpoint (remat) and a scan-dispatch-floor reference. Writes
examples/realsplit2_98k_tpu.out."""

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
    from admp_tpu.ops.exclusions import build_sparse_exclusions
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import (
        rot_local2global,
        rotate_harm_components,
    )
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

    emit(f"{pairs.shape[0]} padded pairs, {n} atoms, n_inner={n_inner}")

    raw_i, raw_j = pairs[..., 0], pairs[..., 1]
    mask = raw_i < raw_j
    i = jnp.minimum(raw_i, n - 1)
    j = jnp.minimum(raw_j, n - 1)

    def qg_of(p):
        frames = construct_local_frames(p, box, axis_types, axis_indices)
        return rot_local2global(q_local, frames, 2)

    qg0 = qg_of(pos0)

    def timeit(name, fn_of_pos):
        f = jax.value_and_grad(fn_of_pos)

        @jax.jit
        def loop(p):
            def body(p, _):
                e, dp = f(p)
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

    # 0. dispatch floor: trivial body in the same harness
    timeit("scan dispatch floor (sum only)", lambda p: jnp.sum(p) * 1e-6)

    def packed_of(p):
        return jnp.concatenate([p, qg0], axis=1)

    # helper returning gathered pieces
    def geom(p):
        packed = packed_of(p)
        g_i, g_j = packed[i], packed[j]
        dx, dy, dz, r, rinv = realspace._displacement_from_rows(
            g_i[:, :3], g_j[:, :3], box, mask
        )
        return g_i, g_j, dx, dy, dz, r, rinv

    # 1. gathers + displacement/norm only
    def disp_only(p):
        _, _, dx, dy, dz, r, _ = geom(p)
        return jnp.sum(jnp.where(mask, r + dx + dy + dz, 0.0)) * 1e-6

    # 2. + QI frame build (no rotations)
    def frame_parts(p):
        g_i, g_j, dx, dy, dz, r, rinv = geom(p)
        fzx, fzy, fzz = dx * rinv, dy * rinv, dz * rinv
        yi, zi = g_i[:, 1], g_i[:, 2]
        yj, zj = g_j[:, 1], g_j[:, 2]
        degenerate = jnp.logical_and(yi == yj, zi == zj)
        one = jnp.ones_like(r)
        seedx = jnp.where(degenerate, 0.0 * one, one)
        seedy = one - seedx
        vx, vy, vz = fzx + seedx, fzy + seedy, fzz
        dot = fzx * vx + fzy * vy + fzz * vz
        vx, vy, vz = vx - fzx * dot, vy - fzy * dot, vz - fzz * dot
        nsq = vx * vx + vy * vy + vz * vz
        small = nsq < 1e-12
        ninv = jnp.where(small, 0.0,
                         1.0 / jnp.sqrt(jnp.where(small, 1.0, nsq)))
        fxx, fxy, fxz = vx * ninv, vy * ninv, vz * ninv
        fyx = fzy * fxz - fzz * fxy
        fyy = fzz * fxx - fzx * fxz
        fyz = fzx * fxy - fzy * fxx
        frame = (fxx, fxy, fxz, fyx, fyy, fyz, fzx, fzy, fzz)
        return g_i, g_j, r, frame

    def frames_only(p):
        _, _, r, frame = frame_parts(p)
        acc = r
        for t in frame:
            acc = acc + t
        return jnp.sum(jnp.where(mask, acc, 0.0)) * 1e-6

    # 3. + one-side rotation / both-side rotations
    def rot_one(p):
        g_i, _, r, frame = frame_parts(p)
        qi_i = rotate_harm_components(
            tuple(g_i[:, 3 + k] for k in range(9)), frame, 2
        )
        acc = r
        for t in qi_i:
            acc = acc + t
        return jnp.sum(jnp.where(mask, acc, 0.0)) * 1e-6

    def rot_both(p):
        g_i, g_j, r, frame = frame_parts(p)
        qi_i = rotate_harm_components(
            tuple(g_i[:, 3 + k] for k in range(9)), frame, 2
        )
        qi_j = rotate_harm_components(
            tuple(g_j[:, 3 + k] for k in range(9)), frame, 2
        )
        acc = r
        for t in qi_i + qi_j:
            acc = acc + t
        return jnp.sum(jnp.where(mask, acc, 0.0)) * 1e-6

    # 4. production with remat around the whole pair pipeline
    def real_e(p):
        return pme_real_energy(
            p, box, pairs, qg_of(p), None, None, None, m_scales, None,
            exclusions, kappa, 2, False, pair_chunk=None,
        )

    def real_e_remat(p):
        return jax.checkpoint(real_e)(p)

    timeit("+ displacement/norm (e+g)", disp_only)
    timeit("+ QI frame build (e+g)", frames_only)
    timeit("+ one-side rotation (e+g)", rot_one)
    timeit("+ both-side rotations (e+g)", rot_both)
    timeit("production (e+g) [reference]", real_e)
    timeit("production under jax.checkpoint (e+g)", real_e_remat)

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
