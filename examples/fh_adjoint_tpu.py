#!/usr/bin/env python
"""Feynman-Hellmann adjoint shortcut: cost and accuracy on the polarizable
bench workload.

``SCFConfig(exact_adjoint=False)`` reproduces the reference's stop_gradient
SCF (admp/pme.py:114-125): forces skip the implicit-adjoint PCG solve and the
field VJP. Error is O(SCF residual): at the default field_tol the dipoles are
converged to where the variational stationarity makes the truncated term
negligible. This script measures the TPU step time in both modes and the
force difference (CPU f64 for a rounding-free error number).

Run: --timing (TPU) or --accuracy (CPU f64). Appends to fh_adjoint_tpu.out.
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).with_suffix(".out")


def build(exact, f64=False):
    import jax
    import jax.numpy as jnp

    from admp_tpu import ADMPPmeForce, SCFConfig, convert_cart2harm
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.settings import EngineConfig
    from admp_tpu.systems import water_system

    dtype = jnp.float64 if f64 else jnp.float32
    sysd = water_system(n_side=10, spacing=3.104, jitter=0.12, seed=0)
    positions = jnp.asarray(sysd["positions"], dtype)
    box = jnp.asarray(sysd["box"], dtype)
    nl = neighbor_list_cell(positions, box, 4.0)
    pairs = jnp.asarray(nl.pairs)
    q_local = convert_cart2harm(jnp.asarray(sysd["q_cart"]), 2).astype(dtype)
    pol = jnp.asarray(sysd["pol"], dtype)
    tholes = jnp.asarray(sysd["tholes"], dtype)
    scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0], dtype)
    scf = SCFConfig(exact_adjoint=exact)
    pme = ADMPPmeForce(
        box, sysd["axis_types"], sysd["axis_indices"], sysd["covalent_map"],
        4.0, 1e-4, lmax=2, lpol=True,
        config=EngineConfig(cache_influence=not f64, scf=scf),
    )
    return pme, positions, box, pairs, q_local, pol, tholes, scales


def emit(msg):
    print(msg, flush=True)
    with OUT.open("a") as fh:
        fh.write(str(msg) + "\n")


def run_timing():
    import jax
    import jax.numpy as jnp

    for exact in (True, False):
        pme, positions, box, pairs, q_local, pol, tholes, scales = build(exact)
        u0, _, _ = pme.optimize_Uind(
            positions, box, pairs, q_local, pol, tholes, scales, scales,
            scales,
        )
        rng = np.random.default_rng(1)
        drift = jnp.asarray(
            0.005 * rng.standard_normal(positions.shape), positions.dtype
        )
        vga = pme._value_grad_aux

        @jax.jit
        def loop(p, u):
            def body(carry, _):
                p, u = carry
                (e, (u_new, _c, _n)), f = vga(
                    p, box, pairs, q_local, pol, tholes,
                    scales, scales, scales, u,
                )
                # consume f or XLA DCEs the backward pass (see bench.py)
                return (p + drift + 0.0 * f, u_new), e
            return jax.lax.scan(body, (p, u), None, length=10)

        out = loop(positions, u0)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = loop(positions, u0)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / 10 * 1e3)
        emit(f"[timing/TPU] exact_adjoint={exact}: polarizable step "
             f"{ms:7.2f} ms")


def run_accuracy():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    forces = {}
    for exact in (True, False):
        pme, positions, box, pairs, q_local, pol, tholes, scales = build(
            exact, f64=True
        )
        (e, _aux), f = pme._value_grad_aux(
            positions, box, pairs, q_local, pol, tholes,
            scales, scales, scales, jax.numpy.zeros_like(positions),
        )
        forces[exact] = np.asarray(f)
        emit(f"[accuracy/CPU-f64] exact_adjoint={exact}: E = {float(e):.8f}")
    df = forces[False] - forces[True]
    rmse = np.sqrt(np.mean(df**2)) / np.sqrt(np.mean(forces[True] ** 2))
    emit(f"[accuracy/CPU-f64] FH force error vs exact adjoint: "
         f"{rmse:.3e} relative RMSE (max abs {np.abs(df).max():.3e})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--timing", action="store_true")
    ap.add_argument("--accuracy", action="store_true")
    args = ap.parse_args()
    if args.accuracy:
        run_accuracy()
    if args.timing:
        run_timing()
