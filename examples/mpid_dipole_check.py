#!/usr/bin/env python
"""Engage the reference's MPID induced-dipole golden (dipole_1024).

The reference demonstrates ~1e-4 per-site agreement of its Jacobi SCF against
MPID dipoles on the water_pol_1024 example
(/root/reference/examples/water_pol_1024/ref_out:2-3073 vs dipole_1024,
driver run_admp.py:134-141).  The shipped PDB for that example is, however,
byte-identical to the 50 A water_1024 box (~0.25 g/cc — NOT the liquid-density
~31.3 A box the golden dipoles evidently came from), and round-1 analysis
claimed the reference's own SCF diverges on it (tests/test_golden_water.py
docstring).  This script produces the committed evidence:

1. Runs the REFERENCE implementation's damped-Jacobi SCF (in-process, as a
   numerical oracle — no code vendored) on the shipped inputs, cold-started
   and warm-started from dipole_1024, recording the max|field| residual trace
   per iteration.
2. Runs this repo's PCG solver (scf/solver.py) on the identical inputs, cold
   and warm, recording convergence and the final residual.  PCG converges on
   any SPD system even where Jacobi's spectral radius exceeds 1, so this
   distinguishes "Jacobi-unstable data" from a true polarization catastrophe
   (indefinite interaction matrix).
3. Wherever a converged solution exists, compares O-site dipoles against
   dipole_1024 at the reference's ~1e-4 envelope (ref_out format: MPID value
   x10 nm->A twice, then the computed value).

Everything is float64 on CPU.  Output -> examples/mpid_dipole_check.out.
"""

import pathlib
import sys
import types

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

REF_DIR = pathlib.Path("/root/reference/examples/water_pol_1024")
KAPPA = 0.657065221219616
RC, ETHRESH, LMAX = 4.0, 1e-4, 2
OUT = pathlib.Path(__file__).with_suffix(".out")


def import_reference():
    if "jax.config" not in sys.modules:
        shim = types.ModuleType("jax.config")
        shim.config = jax.config
        sys.modules["jax.config"] = shim
    sys.path.insert(0, "/root/reference")
    import admp.pme as ref_pme  # noqa: F401

    return sys.modules["admp.pme"]


def main():
    lines = []

    def emit(msg):
        print(msg)
        lines.append(str(msg))

    from admp_tpu.io import load_mpid_system
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.ops.harmonics import convert_cart2harm

    s = load_mpid_system(str(REF_DIR / "water1024.pdb"), str(REF_DIR / "mpidwater.xml"))
    pos = jnp.asarray(s.positions)
    box = jnp.asarray(s.box)
    n = s.n_atoms
    nl = neighbor_list_cell(pos, box, RC)
    assert not bool(nl.did_overflow)
    pairs = jnp.asarray(nl.pairs)
    q_local = convert_cart2harm(jnp.asarray(s.q_cart), LMAX)
    pol = jnp.asarray(s.pol)
    tholes = jnp.asarray(s.tholes)
    scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])

    # MPID golden dipoles: nm in file, x10 -> A (reference driver
    # run_admp.py:74-78)
    u_mpid = 10.0 * np.loadtxt(REF_DIR / "dipole_1024")
    assert u_mpid.shape == (n, 3)
    u_mpid_j = jnp.asarray(u_mpid)

    emit(f"# system: {n} atoms, box diag {np.diag(np.asarray(box))}, "
         f"{int(pairs.shape[0])} pair slots")
    emit(f"# kappa={KAPPA} rc={RC} ethresh={ETHRESH} lmax={LMAX}")

    # ---------------------------------------------------------------- ref
    ref_pme = import_reference()
    DIELECTRIC = ref_pme.DIELECTRIC
    ref_force = ref_pme.ADMPPmeForce(
        box, np.asarray(s.axis_types), np.asarray(s.axis_indices),
        jnp.asarray(s.covalent_map), RC, ETHRESH, LMAX, lpol=True,
    )
    ref_force.update_env("kappa", KAPPA)

    # dedupe+filter pairs the way the reference expects (it handles this
    # internally; padded self-pairs [n,n] would index out of bounds, so strip)
    pairs_np = np.asarray(pairs)
    real = pairs_np[(pairs_np[:, 0] < n) & (pairs_np[:, 1] < n)]
    pairs_ref = jnp.asarray(real)

    pol_mask = np.asarray(pol) > 0.001

    def ref_jacobi_trace(u0, label, n_iter=30):
        """The reference's damped-Jacobi update (admp/pme.py:132-138),
        instrumented to record the residual-field trace."""
        u = jnp.asarray(u0)
        trace = []
        for it in range(n_iter):
            field = ref_force.grad_U_fn(
                pos, box, pairs_ref, q_local, u, pol, tholes,
                scales, scales, scales,
            )
            resid = float(jnp.max(jnp.abs(field[pol_mask])))
            trace.append(resid)
            if resid < 10.0:  # POL_CONV, reference settings.py:29
                emit(f"ref-jacobi[{label}] CONVERGED at iter {it}: "
                     f"max|field|={resid:.6g}")
                return u, trace, True
            if not np.isfinite(resid) or resid > 1e12:
                emit(f"ref-jacobi[{label}] DIVERGED at iter {it}: "
                     f"max|field|={resid:.6g}")
                return u, trace, False
            u = u - field * pol[:, None] / DIELECTRIC
        emit(f"ref-jacobi[{label}] NOT CONVERGED after {n_iter} iters: "
             f"max|field|={trace[-1]:.6g}")
        return u, trace, False

    for label, u0 in [("cold", jnp.zeros((n, 3))), ("warm-mpid", u_mpid_j)]:
        u_ref, trace, ok = ref_jacobi_trace(u0, label)
        emit(f"  trace[{label}]: " + " ".join(f"{t:.4g}" for t in trace))
        if ok:
            d = np.abs(np.asarray(u_ref) - u_mpid)[::3]  # O sites
            emit(f"  O-site |u - mpid|: max={d.max():.3e} mean={d.mean():.3e}")

    # ---------------------------------------------------------------- repo
    from admp_tpu import ADMPPmeForce, SCFConfig

    force = ADMPPmeForce(
        box, s.axis_types, s.axis_indices, s.covalent_map,
        RC, ETHRESH, lmax=LMAX, lpol=True,
        scf_config=SCFConfig(max_iter=100),
    )
    force.update_env("kappa", KAPPA)

    for label, u0 in [("cold", jnp.zeros((n, 3))), ("warm-mpid", u_mpid_j)]:
        u_pcg, conv, n_it = force.optimize_Uind(
            pos, box, pairs, q_local, pol, tholes, scales, scales, scales,
            U_init=u0,
        )
        field = force.grad_U_fn(
            pos, box, pairs, q_local, u_pcg, pol, tholes,
            scales, scales, scales,
        )
        resid = float(jnp.max(jnp.abs(field[pol_mask])))
        finite = bool(np.isfinite(np.asarray(u_pcg)).all())
        emit(f"repo-pcg[{label}]: converged={bool(conv)} iters={int(n_it)} "
             f"max|field|={resid:.6g} finite={finite} "
             f"max|u|={float(jnp.max(jnp.abs(u_pcg))):.6g}")
        if finite and resid < 10.0:
            d = np.abs(np.asarray(u_pcg) - u_mpid)[::3]
            emit(f"  O-site |u - mpid|: max={d.max():.3e} mean={d.mean():.3e}")
            # cross-code residual: the REFERENCE's own field operator evaluated
            # at the repo PCG solution must also be converged — proving the
            # solution solves the reference's induced-dipole equations, which
            # the reference's Jacobi iteration cannot reach on this data
            ref_field = ref_force.grad_U_fn(
                pos, box, pairs_ref, q_local, u_pcg, pol, tholes,
                scales, scales, scales,
            )
            ref_resid = float(jnp.max(jnp.abs(ref_field[pol_mask])))
            emit(f"  reference-field residual at repo solution: "
                 f"max|field|={ref_resid:.6g} (converged per reference "
                 f"criterion: {ref_resid < 10.0})")

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
