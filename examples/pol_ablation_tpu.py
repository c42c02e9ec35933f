#!/usr/bin/env python
"""Fused-graph ablation of the polarizable bench step (primary metric).

Isolated component timings overstate (XLA overlaps across the fused step), so
this measures the FULL value_grad step under targeted config ablations and
attributes cost by differences:

  frozen-u e+g          — energy_fn at constant u*, grad wrt positions only:
                          everything except the SCF solve and its adjoint
  FH adjoint            — exact_adjoint=False: drops the implicit-adjoint PCG
                          and the field-VJP (Hessian-vector product)
  adjoint_fixed_iters=k — pins the adjoint PCG depth
  fixed_iters=k         — pins the forward PCG depth (static unroll)

Writes examples/pol_ablation_tpu.out.
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

    from admp_tpu import ADMPPmeForce, SCFConfig, convert_cart2harm
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.settings import EngineConfig
    from admp_tpu.systems import water_system

    sysd = water_system(n_side=10, spacing=3.104, jitter=0.12, seed=0)
    positions = jnp.asarray(sysd["positions"], dtype=jnp.float32)
    box = jnp.asarray(sysd["box"], dtype=jnp.float32)
    n = positions.shape[0]
    rc, ethresh = 4.0, 1e-4
    nlist = neighbor_list_cell(positions, box, rc)
    pairs = jnp.asarray(nlist.pairs)
    q_local = convert_cart2harm(jnp.asarray(sysd["q_cart"]), 2).astype(
        jnp.float32
    )
    pol = jnp.asarray(sysd["pol"], dtype=jnp.float32)
    tholes = jnp.asarray(sysd["tholes"], dtype=jnp.float32)
    scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0], dtype=jnp.float32)

    def make_pme(scf):
        return ADMPPmeForce(
            box, sysd["axis_types"], sysd["axis_indices"],
            sysd["covalent_map"], rc, ethresh, lmax=2, lpol=True,
            config=EngineConfig(cache_influence=True, scf=scf),
        )

    pme = make_pme(SCFConfig())
    u0, _, _ = pme.optimize_Uind(
        positions, box, pairs, q_local, pol, tholes, scales, scales, scales,
    )
    u0 = u0.astype(jnp.float32)

    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.005 * rng.standard_normal((n, 3)),
                        dtype=jnp.float32)
    n_inner = 10
    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    def timeit(name, make_body, carry0):
        @jax.jit
        def loop(c):
            return jax.lax.scan(make_body(), c, None, length=n_inner)

        out = loop(carry0)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = loop(carry0)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{name:46s} {ms:7.2f} ms/step")
        return ms

    def body_full(pme_v):
        vga = pme_v._value_grad_aux

        def make():
            def body(carry, _):
                p, u = carry
                (e, (u_new, _c, _n)), f = vga(
                    p, box, pairs, q_local, pol, tholes,
                    scales, scales, scales, u,
                )
                # consume f or XLA DCEs the backward pass (see bench.py)
                return (p + drift + 0.0 * f, u_new), e
            return body
        return make

    # frozen-u: the full polarizable energy at constant dipoles, e+g wrt
    # positions — no solver, no adjoint, no field builds
    vg_frozen = jax.value_and_grad(
        lambda p, u: pme.energy_fn(
            p, box, pairs, q_local, u, pol, tholes, scales, scales, scales
        )
    )

    def make_frozen():
        def body(carry, _):
            p, u = carry
            e, f = vg_frozen(p, u)
            # consume f or XLA DCEs the backward pass (see bench.py)
            return (p + drift + 0.0 * f, u), e
        return body

    def body_full_w(pme_v):
        """Adjoint-carrying step: W_adj threads through the scan carry like
        U_ind (SCFConfig.adjoint_warmstart — the fwd pre-solves the adjoint
        system from the carried w, the bwd only refines)."""
        vga = pme_v._value_grad_aux_w

        def make():
            def body(carry, _):
                p, u, w = carry
                (e, (u_new, _c, _n, w_new)), f = vga(
                    p, box, pairs, q_local, pol, tholes,
                    scales, scales, scales, u, w,
                )
                # consume f or XLA DCEs the backward pass (see bench.py)
                return (p + drift + 0.0 * f, u_new, w_new), e
            return body
        return make

    w0 = jnp.zeros_like(u0)

    timeit("frozen-u e+g (no solve, no adjoint)", make_frozen, (positions, u0))
    full = timeit("FULL exact, adjoint warmstart OFF (r3 baseline)",
                  body_full(pme), (positions, u0))
    timeit("FULL exact + carried-w adjoint warmstart",
           body_full_w(make_pme(SCFConfig(adjoint_warmstart=True))),
           (positions, u0, w0))
    # the exact-adjoint fast profile: the adjoint (and forward-PCG) matvecs
    # run on the order-4, half-resolution dipole mesh — gradient accuracy
    # already FD-measured in exact mode (df 3.1e-8 cold at tol=1e-3, CPU
    # f64, examples/fh_accuracy_cpu.out); the implicit-adjoint correction is
    # itself O(SCF residual), so an eps_op-perturbed adjoint operator moves
    # the correction by eps_op x (already-small term)
    timeit("FULL exact + matvec order4+gdiv2",
           body_full(make_pme(SCFConfig(matvec_spread_order=4,
                                        matvec_grid_div=2))),
           (positions, u0))
    timeit("FULL exact + matvec o4+g2 + adj_fixed=3",
           body_full(make_pme(SCFConfig(matvec_spread_order=4,
                                        matvec_grid_div=2,
                                        adjoint_fixed_iters=3))),
           (positions, u0))
    timeit("FH adjoint (no adjoint solve, no field-VJP)",
           body_full(make_pme(SCFConfig(exact_adjoint=False))),
           (positions, u0))
    timeit("adjoint_fixed_iters=3",
           body_full(make_pme(SCFConfig(adjoint_fixed_iters=3))),
           (positions, u0))
    timeit("fixed_iters=2 (fwd static unroll)",
           body_full(make_pme(SCFConfig(fixed_iters=2))),
           (positions, u0))
    timeit("fixed_iters=2 + adjoint_fixed_iters=3",
           body_full(make_pme(SCFConfig(fixed_iters=2,
                                        adjoint_fixed_iters=3))),
           (positions, u0))

    # --- the bench MD profile (FH @ field_tol=0.3) and its reduced-matvec /
    # static-unroll variants (SCFConfig.matvec_spread_order/matvec_grid_div:
    # accuracy ladder in examples/fh_accuracy_cpu.out) ---
    import dataclasses as dc

    md = SCFConfig.md()
    timeit("FH@0.3 (bench MD profile)",
           body_full(make_pme(md)), (positions, u0))
    timeit("FH@0.3 + matvec order4",
           body_full(make_pme(dc.replace(md, matvec_spread_order=4))),
           (positions, u0))
    timeit("FH@0.3 + matvec gdiv2",
           body_full(make_pme(dc.replace(md, matvec_grid_div=2))),
           (positions, u0))
    timeit("FH@0.3 + matvec order4+gdiv2",
           body_full(make_pme(dc.replace(
               md, matvec_spread_order=4, matvec_grid_div=2))),
           (positions, u0))
    timeit("FH@0.3 + fixed_iters=2",
           body_full(make_pme(dc.replace(md, fixed_iters=2))),
           (positions, u0))
    timeit("FH@0.3 + fixed2 + matvec order4+gdiv2",
           body_full(make_pme(dc.replace(
               md, fixed_iters=2, matvec_spread_order=4, matvec_grid_div=2))),
           (positions, u0))

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
