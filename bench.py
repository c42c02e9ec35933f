#!/usr/bin/env python
"""Benchmark: water_1024 full-force-field energy+force step on the real device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (the reference's flagship example, examples/water_1024/run_admp.py):
3072-atom MPID water box, one energy+force step of the complete force field —
multipolar electrostatic PME (lmax=2, K=154^3 mesh) + dispersion PME
(C6/C8/C10, three grids) + Tang-Toennies short-range — jit-compiled, float32 on
TPU, fixed-capacity neighbor pairs (neighbor refresh excluded, as in MD loops).

The reference publishes no timing numbers (BASELINE.md): vs_baseline is
reported as the ratio of the previous round's recorded value to this run
(>1 = faster than last round) or 1.0 when no history exists.
"""

import json
import pathlib
import time

import numpy as np


def build_workload():
    import jax
    import jax.numpy as jnp

    from admp_tpu import (
        ADMPDispPmeForce,
        ADMPPmeForce,
        convert_cart2harm,
        generate_pairwise_interaction,
        tt_damping_qq_c6_kernel,
    )
    from admp_tpu.ops.neighborlist import neighbor_list_cell

    ref_pdb = pathlib.Path("/root/reference/examples/water_1024/water1024.pdb")
    if ref_pdb.exists():
        from admp_tpu.io import load_mpid_system

        sysd = load_mpid_system(
            str(ref_pdb),
            str(ref_pdb.parent / "mpidwater.xml"),
        )
        positions, box = sysd.positions, sysd.box
        axis_types, axis_indices = sysd.axis_types, sysd.axis_indices
        covalent_map = sysd.covalent_map
        q_cart = sysd.q_cart
        n = sysd.n_atoms
        from admp_tpu.systems import water_system as _ws  # params only
        params = _ws(n_side=1)
        nmol = n // 3
        c_list = np.tile(params["c_list"][:3], (nmol, 1))
        tt_a = np.tile(params["tt_a"][:3], nmol)
        tt_b = np.tile(params["tt_b"][:3], nmol)
        tt_q = np.tile(params["tt_q"][:3], nmol)
    else:
        from admp_tpu.systems import water_system

        sysd = water_system(n_side=10, spacing=3.104, jitter=0.12, seed=0)
        positions, box = sysd["positions"], sysd["box"]
        axis_types, axis_indices = sysd["axis_types"], sysd["axis_indices"]
        covalent_map = sysd["covalent_map"]
        q_cart = sysd["q_cart"]
        c_list, tt_a, tt_b, tt_q = (
            sysd["c_list"], sysd["tt_a"], sysd["tt_b"], sysd["tt_q"]
        )
        n = positions.shape[0]

    rc, ethresh = 4.0, 1e-4
    nlist = neighbor_list_cell(positions, box, rc)
    pairs = jnp.asarray(nlist.pairs)

    box_j = jnp.asarray(box)
    q_local = convert_cart2harm(jnp.asarray(q_cart), 2)
    m_scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])

    # reference-parity configuration (K from the OpenMM heuristic, kappa
    # pinned to the MPID value); fixed-cell influence caching for dispersion
    pme = ADMPPmeForce(
        box_j, axis_types, axis_indices, covalent_map, rc, ethresh, lmax=2,
    )
    pme.update_env("kappa", 0.657065221219616)
    disp = ADMPDispPmeForce(
        box_j, covalent_map, rc, ethresh, pmax=10, cache_influence=True,
    )
    disp.kappa = 0.657065221219616
    disp.refresh_calculators()
    tt = generate_pairwise_interaction(tt_damping_qq_c6_kernel, covalent_map)

    c_j = jnp.asarray(c_list)
    a_j, b_j, q_j = jnp.asarray(tt_a), jnp.asarray(tt_b), jnp.asarray(tt_q)

    def total_energy(pos):
        e = pme.get_energy(pos, box_j, pairs, q_local, m_scales)
        e = e + disp.get_energy(pos, box_j, pairs, c_j, m_scales)
        e = e + tt(pos, box_j, pairs, m_scales, a_j, b_j, q_j, c_j[:, 0])
        return e

    grad_step = jax.value_and_grad(total_energy)
    n_inner = 10

    @jax.jit
    def multi_step(pos):
        # MD-loop measurement: N steps inside one scan, as a production
        # integrator runs — amortizes host->device dispatch latency
        def body(p, _):
            e, f = grad_step(p)
            return p + 0.0 * f, e
        return jax.lax.scan(body, pos, None, length=n_inner)

    pos_j = jnp.asarray(positions)
    return multi_step, pos_j, n_inner


def main():
    import jax

    step, pos, n_inner = build_workload()
    # warmup / compile
    out = step(pos)
    jax.block_until_ready(out)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = step(pos)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) / n_inner * 1e3)

    vs_baseline = 1.0
    hist = sorted(pathlib.Path(".").glob("BENCH_r*.json"))
    if hist:
        try:
            prev = json.loads(hist[-1].read_text())
            if prev.get("metric", "").startswith("water_1024") and prev.get("value"):
                vs_baseline = float(prev["value"]) / ms
        except Exception:
            pass

    print(json.dumps({
        "metric": "water_1024 energy+force step (PME lmax=2 + disp PME + TT)",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
