#!/usr/bin/env python
"""Polarizable-step SCF-unrolling experiment on the real TPU.

The round-2 profile attributes most of the polarizable overhead to the SCF
solve (field(0) + PCG matvecs + the implicit-adjoint solve); the while_loops
serialize against the surrounding graph. This measures the bench workload
with statically-unrolled PCG (SCFConfig.fixed_iters / adjoint_fixed_iters)
against the default dynamic loops, with a force-accuracy gate.

Output -> examples/pol_unroll_tpu.out.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).with_suffix(".out")


def main():
    import time as _t

    import jax
    import jax.numpy as jnp

    # the first device fetch after TPU init occasionally FAILED_PRECONDITIONs
    # through the tunnel; poke-and-retry before real work
    for attempt in range(5):
        try:
            float(jnp.zeros(()) + 1.0)
            break
        except Exception:  # noqa: BLE001
            _t.sleep(20.0)

    from admp_tpu import ADMPPmeForce, SCFConfig, convert_cart2harm
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.settings import EngineConfig
    from admp_tpu.systems import water_system

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    sysd = water_system(n_side=10, spacing=3.104, jitter=0.12, seed=0)
    positions = jnp.asarray(sysd["positions"], jnp.float32)
    box = jnp.asarray(sysd["box"], jnp.float32)
    n = positions.shape[0]
    nlist = neighbor_list_cell(positions, box, 4.0)
    pairs = jnp.asarray(nlist.pairs)
    q_local = convert_cart2harm(jnp.asarray(sysd["q_cart"]), 2).astype(jnp.float32)
    pol = jnp.asarray(sysd["pol"], jnp.float32)
    tholes = jnp.asarray(sysd["tholes"], jnp.float32)
    scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0], jnp.float32)
    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.005 * rng.standard_normal((n, 3)), jnp.float32)
    n_inner = 10

    f_ref = {}

    def run(name, scf):
        pme = ADMPPmeForce(
            box, sysd["axis_types"], sysd["axis_indices"], sysd["covalent_map"],
            4.0, 1e-4, lmax=2, lpol=True,
            config=EngineConfig(cache_influence=True, scf=scf),
        )
        u0, _, nit0 = pme.optimize_Uind(
            positions, box, pairs, q_local, pol, tholes, scales, scales, scales
        )
        vga = pme._value_grad_aux

        @jax.jit
        def multi(pos, u):
            def body(carry, _):
                p, u_prev = carry
                (e, (u_new, conv, n_it)), f = vga(
                    p, box, pairs, q_local, pol, tholes,
                    scales, scales, scales, u_prev,
                )
                return (p + drift, u_new), (e, f, conv, n_it)
            (p_out, u_out), out = jax.lax.scan(body, (pos, u), None,
                                               length=n_inner)
            return out

        es, fs, convs, nits = multi(positions, u0)
        jax.block_until_ready(es)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = multi(positions, u0)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times) / n_inner * 1e3)
        f_last = np.asarray(fs[-1], np.float64)
        if "default" not in f_ref:
            f_ref["default"] = f_last
            rel = 0.0
        else:
            d = f_last - f_ref["default"]
            rel = float(np.sqrt((d * d).mean())
                        / np.sqrt((f_ref["default"] ** 2).mean()))
        emit(f"{name:34s} {ms:7.2f} ms/step  conv={bool(convs[-1])} "
             f"iters(last)={int(nits[-1])}  relF-vs-default={rel:.3g}")

    run("default (while_loop PCG)", SCFConfig())
    run("fixed_iters=2", SCFConfig(fixed_iters=2))
    run("fixed_iters=2 + adjoint_fixed=6", SCFConfig(fixed_iters=2,
                                                     adjoint_fixed_iters=6))
    run("fixed_iters=3 + adjoint_fixed=8", SCFConfig(fixed_iters=3,
                                                     adjoint_fixed_iters=8))
    run("fixed_iters=1 + adjoint_fixed=4", SCFConfig(fixed_iters=1,
                                                     adjoint_fixed_iters=4))

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
