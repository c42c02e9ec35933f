#!/usr/bin/env python
"""Feynman-Hellmann force error vs SCF convergence tolerance (CPU, f64).

The FH gradient mode (SCFConfig.exact_adjoint=False — the reference's own
semantics, admp/pme.py:83,114-125) drops the implicit-adjoint solve and the
field-VJP from every force call; its force error is O(SCF residual). The
honest round-3 timing harness (examples/pol_ablation_tpu.out) shows the exact
adjoint costs ~9 ms per adjoint PCG iteration plus ~20 ms of field-VJP on the
3000-atom bench, while FH costs nothing — so for production f32 MD the right
question is: how tight must field_tol be for the FH error to sit below the
f32 working-precision floor (4.3e-4 relative force RMSE)?

This script measures it: exact-adjoint forces at field_tol=1e-4 in f64 are
the oracle; FH forces at a ladder of field_tol values (warm-started the way
an MD loop runs) give rel-F-RMSE vs that oracle. Writes
examples/fh_accuracy_cpu.out.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).with_suffix(".out")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from admp_tpu import ADMPPmeForce, SCFConfig, convert_cart2harm
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.settings import EngineConfig
    from admp_tpu.systems import water_system

    sysd = water_system(n_side=8, spacing=3.104, jitter=0.12, seed=0)
    positions = jnp.asarray(sysd["positions"], dtype=jnp.float64)
    box = jnp.asarray(sysd["box"], dtype=jnp.float64)
    rc, ethresh = 4.0, 1e-4
    nlist = neighbor_list_cell(positions, box, rc)
    pairs = jnp.asarray(nlist.pairs)
    q_local = convert_cart2harm(jnp.asarray(sysd["q_cart"]), 2)
    pol = jnp.asarray(sysd["pol"], dtype=jnp.float64)
    tholes = jnp.asarray(sysd["tholes"], dtype=jnp.float64)
    scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0], dtype=jnp.float64)

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))
        # flush progressively: each config costs minutes of f64 CPU compile
        # and a timeout must not lose the rows already measured (it did
        # once — round 4)
        OUT.write_text("\n".join(lines) + "\n")

    def forces(scf, u_init=None):
        pme = ADMPPmeForce(
            box, sysd["axis_types"], sysd["axis_indices"],
            sysd["covalent_map"], rc, ethresh, lmax=2, lpol=True,
            config=EngineConfig(scf=scf),
        )
        (e, (u, conv, n_it)), f = pme._value_grad_aux(
            positions, box, pairs, q_local, pol, tholes,
            scales, scales, scales,
            jnp.zeros_like(positions) if u_init is None else u_init,
        )
        return np.asarray(f), np.asarray(u), int(n_it), bool(conv)

    # converge tightly at the base geometry, then DRIFT the positions one
    # MD-step's worth (~5e-3 A) and warm-start from the pre-drift dipoles —
    # the state every MD force call actually sees. Without the drift the
    # entry residual is already ~0 and every tolerance row degenerates to
    # the same 0-iteration answer.
    _, u_base, n_cold, _ = forces(SCFConfig(field_tol=1e-4))
    rng = np.random.default_rng(7)
    drifted = positions + jnp.asarray(
        0.005 * rng.standard_normal(positions.shape)
    )
    u_warm = jnp.asarray(u_base)

    def forces_at(scf, pos, u_init):
        pme = ADMPPmeForce(
            box, sysd["axis_types"], sysd["axis_indices"],
            sysd["covalent_map"], rc, ethresh, lmax=2, lpol=True,
            config=EngineConfig(scf=scf),
        )
        (e, (u, conv, n_it)), f = pme._value_grad_aux(
            pos, box, pairs, q_local, pol, tholes,
            scales, scales, scales, u_init,
        )
        return np.asarray(f), int(n_it)

    f_ref, n_ref = forces_at(SCFConfig(field_tol=1e-4), drifted, u_warm)
    fn = float(np.sqrt(np.mean(f_ref**2)))
    emit(f"oracle: exact adjoint at drifted positions, field_tol=1e-4, "
         f"{n_ref} warm PCG iters (cold solve was {n_cold}), |F|rms {fn:.4f}")
    emit(f"{'field_tol':>10s} {'mode':>6s} {'iters':>5s} "
         f"{'rel-F-RMSE':>11s} {'max-rel':>9s}")

    for tol in (10.0, 3.0, 1.0, 0.3, 0.1, 0.01):
        for exact in (False, True):
            f, n_it = forces_at(
                SCFConfig(field_tol=tol, exact_adjoint=exact), drifted, u_warm
            )
            d = f - f_ref
            rel = float(np.sqrt(np.mean(d**2)) / fn)
            mx = float(np.max(np.abs(d)) / np.max(np.abs(f_ref)))
            emit(f"{tol:10.2g} {'exact' if exact else 'FH':>6s} {n_it:5d} "
                 f"{rel:11.3e} {mx:9.2e}")

    # cold-start FH at the default tol, for scale
    f, n_it = forces_at(
        SCFConfig(field_tol=10.0, exact_adjoint=False), drifted,
        jnp.zeros_like(u_warm),
    )
    d = f - f_ref
    emit(f"cold-start FH field_tol=10: {n_it} iters, "
         f"rel {float(np.sqrt(np.mean(d**2))/fn):.3e}")

    # reduced-accuracy PCG matvec (SCFConfig.matvec_spread_order /
    # matvec_grid_div): r0 comes from the full field, so operator error only
    # perturbs the correction — measure the end-to-end FH force error at the
    # MD profile tolerance, warm-started, plus a cold start (worst case: the
    # full dipole field rides the perturbed operator)
    emit("matvec reduction at FH field_tol=0.3 (warm / cold):")
    emit(f"{'order':>6s} {'gdiv':>4s} {'iters':>5s} {'rel-F-RMSE':>11s} "
         f"{'cold-it':>7s} {'cold-rel':>9s}")
    for order, gdiv in ((None, 1), (4, 1), (6, 2), (4, 2)):
        scf = SCFConfig(field_tol=0.3, exact_adjoint=False,
                        matvec_spread_order=order, matvec_grid_div=gdiv)
        f, n_it = forces_at(scf, drifted, u_warm)
        d = f - f_ref
        rel = float(np.sqrt(np.mean(d**2)) / fn)
        fc, n_cold2 = forces_at(scf, drifted, jnp.zeros_like(u_warm))
        dc = fc - f_ref
        relc = float(np.sqrt(np.mean(dc**2)) / fn)
        emit(f"{str(order):>6s} {gdiv:4d} {n_it:5d} {rel:11.3e} "
             f"{n_cold2:7d} {relc:9.3e}")

    # exact-adjoint FAST profiles (round 4): reduced matvec shared by the
    # forward PCG and the implicit-adjoint solve, with the adjoint depth cut
    # by fixed iterations or a loosened relative tolerance. Error analysis:
    # the adjoint correction is itself O(SCF residual); resolving it to eps
    # relative leaves eps x (already-small term) — so even eps ~ 1e-3 should
    # land orders below the f32 floor. Measured here in f64 vs the tight
    # exact oracle (same warm/cold methodology as above).
    emit("exact-adjoint fast profiles (warm / cold):")
    emit(f"{'profile':>28s} {'iters':>5s} {'rel-F-RMSE':>11s} "
         f"{'cold-it':>7s} {'cold-rel':>9s}")
    profiles = [
        ("o4+g2 (adj while, tol 1e-8)",
         SCFConfig(matvec_spread_order=4, matvec_grid_div=2)),
        ("o4+g2 + adj_fixed=3",
         SCFConfig(matvec_spread_order=4, matvec_grid_div=2,
                   adjoint_fixed_iters=3)),
        ("o4+g2 + adj_fixed=2",
         SCFConfig(matvec_spread_order=4, matvec_grid_div=2,
                   adjoint_fixed_iters=2)),
        ("o4+g2 + adj_tol=1e-3",
         SCFConfig(matvec_spread_order=4, matvec_grid_div=2,
                   adjoint_tol=1e-3)),
    ]
    for name, scf in profiles:
        f, n_it = forces_at(scf, drifted, u_warm)
        d = f - f_ref
        rel = float(np.sqrt(np.mean(d**2)) / fn)
        fc, n_c = forces_at(scf, drifted, jnp.zeros_like(u_warm))
        dc = fc - f_ref
        relc = float(np.sqrt(np.mean(dc**2)) / fn)
        emit(f"{name:>28s} {n_it:5d} {rel:11.3e} {n_c:7d} {relc:9.3e}")

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
