#!/usr/bin/env python
"""Pallas spread kernel: real-TPU correctness + end-to-end step timing.

Round-1 state (ROADMAP.md): the slab-decomposed Pallas spread wins in
isolation (9.5 -> 5.9 ms at water_1024 scale) but is step-time neutral
end-to-end, and its correctness tests ran only in interpreter mode on CPU.
This script is the round-2 decision evidence: non-interpret correctness of
the kernel against the XLA scatter on the real device, then the full
electrostatic energy+force step timed with spread_method='scatter' vs
'pallas'. Output -> examples/pallas_tpu_check.out.
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

    from admp_tpu import ADMPPmeForce, convert_cart2harm
    from admp_tpu.io import load_mpid_system
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.ops.reciprocal import mesh_coordinates, spread_weights
    from admp_tpu.ops.pallas.spread import spread_blocks
    from admp_tpu.settings import EngineConfig

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    ref = pathlib.Path("/root/reference/examples/water_1024")
    s = load_mpid_system(str(ref / "water1024.pdb"), str(ref / "mpidwater.xml"))
    positions = jnp.asarray(s.positions, jnp.float32)
    box = jnp.asarray(s.box, jnp.float32)
    nl = neighbor_list_cell(positions, box, 4.0)
    pairs = jnp.asarray(nl.pairs)
    q_local = convert_cart2harm(jnp.asarray(s.q_cart, jnp.float32), 2)
    m_scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0], jnp.float32)

    # --- kernel correctness on the real device (non-interpret) -------------
    grid_shape = (154, 154, 154)
    k1, k2, k3 = grid_shape

    @jax.jit
    def both(pos, q):
        m_u0, u0, dug = mesh_coordinates(pos, box, grid_shape)
        w = spread_weights(u0, dug, 2)
        qq = jnp.concatenate([q[:, :4], q[:, 4:9] / 3.0], axis=-1)
        q_points = jnp.einsum("ah,aijkh->aijk", qq, w)
        mesh_p = spread_blocks(m_u0, q_points, grid_shape, 16, False)
        offsets = jnp.arange(-3, 3)
        i1 = jnp.mod(m_u0[:, 0:1] + offsets[None, :], k1)
        i2 = jnp.mod(m_u0[:, 1:2] + offsets[None, :], k2)
        i3 = jnp.mod(m_u0[:, 2:3] + offsets[None, :], k3)
        flat = ((i1[:, :, None, None] * k2 + i2[:, None, :, None]) * k3
                + i3[:, None, None, :]).reshape(-1)
        mesh_s = jnp.zeros((k1 * k2 * k3,), q_points.dtype).at[flat].add(
            q_points.reshape(-1)).reshape(grid_shape)
        err = jnp.max(jnp.abs(mesh_p - mesh_s))
        scale = jnp.max(jnp.abs(mesh_s))
        return err, scale

    err, scale = both(positions, q_local)
    emit(f"pallas-vs-scatter mesh max abs diff: {float(err):.3e} "
         f"(mesh max {float(scale):.3e}) on {jax.devices()[0]}")

    # --- end-to-end step timing --------------------------------------------
    n_inner = 10
    for method in ("scatter", "pallas"):
        pme = ADMPPmeForce(
            box, s.axis_types, s.axis_indices, s.covalent_map, 4.0, 1e-4,
            lmax=2, config=EngineConfig(spread_method=method),
        )
        pme.update_env("kappa", 0.657065221219616)
        grad_step = jax.value_and_grad(
            lambda p: pme.get_energy(p, box, pairs, q_local, m_scales)
        )

        @jax.jit
        def multi(p):
            def body(pp, _):
                e, f = grad_step(pp)
                return pp + 0.0 * f, e
            return jax.lax.scan(body, p, None, length=n_inner)

        out = multi(positions)
        jax.block_until_ready(out)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = multi(positions)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times) / n_inner * 1e3)
        emit(f"spread_method={method:8s} electro step {ms:.2f} ms "
             f"(E={float(out[1][0]):.4f})")

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
