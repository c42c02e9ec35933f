"""Induced-dipole self-consistent field: on-device linear solvers with exact
implicit-function differentiation.

The reference converges induced dipoles with a *host-side* Python loop of damped
Jacobi steps (reference: admp/pme.py:111-143) — one device->host sync per
iteration — and truncates all gradients through the SCF by stop_gradient,
justifying the result with the Feynman-Hellmann theorem (admp/pme.py:83,114-125).
That is exact only for the total energy at tight convergence; gradients of any
other function of the dipoles (e.g. dipole-fitting losses) are silently wrong.

Here:
* The polarization energy is exactly quadratic in the induced dipoles U, so
  field(U) = dE/dU = A U - b defines an SPD linear system. We solve it with a
  diagonally-preconditioned conjugate-gradient loop inside ``lax.while_loop`` —
  fully on device, jit-compiled, no host syncs. A damped-Jacobi mode is kept for
  cross-validation with the reference.
* The solve is wrapped in ``jax.custom_vjp`` implementing the implicit-function
  adjoint: given the cotangent g of U*, solve A w = g once and propagate
  -(d field/d theta)^T w. This yields *exact* gradients of arbitrary downstream
  functions with respect to all parameters (positions, multipoles,
  polarizabilities, Thole widths, scale tables).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from admp_tpu.settings import SCFConfig
from admp_tpu.utils.constants import DIELECTRIC


def _tree_dot(a, b):
    leaves = jax.tree_util.tree_map(lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def _pcg_fixed(matvec, r0, precond, x0, n_iters, tol_field, site_mask):
    """Statically-unrolled PCG: exactly ``n_iters`` iterations, no
    while_loop. The absence of dynamic control flow lets XLA fuse/overlap the
    iterations with the surrounding energy graph (warm-started MD needs 0-2
    iterations; extra ones are harmless). Convergence is REPORTED from the
    final residual, not enforced.

    Takes the initial residual ``r0 = b - A x0`` directly: PCG never needs
    ``b`` again, and the caller can usually produce ``r0`` cheaper than
    ``b`` + one matvec (``-field(u0)`` is one field build; ``-field(0)``
    followed by ``matvec(u0)`` is a field build AND a matvec)."""
    r = r0
    z = precond(r)
    p = z
    rz = _tree_dot(r, z)
    x = x0
    for _ in range(n_iters):
        ap = matvec(p)
        p_ap = _tree_dot(p, ap)
        alpha = jnp.where(
            p_ap != 0.0, rz / jnp.where(p_ap == 0.0, 1.0, p_ap), 0.0
        )
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = _tree_dot(r, z)
        beta = jnp.where(rz != 0.0, rz_new / jnp.where(rz == 0.0, 1.0, rz), 0.0)
        p = z + beta * p
        rz = rz_new
    resid = jnp.max(jnp.abs(r * site_mask))
    return x, resid < tol_field, jnp.asarray(n_iters, jnp.int32)


def _pcg(matvec, r0, precond, x0, max_iter, tol_field, site_mask):
    """Preconditioned CG on A x = b; terminates when the *field residual*
    max |A x - b| over polarizable sites drops below tol_field (the reference's
    convergence metric, admp/pme.py:136). Takes ``r0 = b - A x0`` directly
    (see _pcg_fixed)."""

    def resid_norm(r):
        return jnp.max(jnp.abs(r * site_mask))

    z0 = precond(r0)
    p0 = z0
    rz0 = _tree_dot(r0, z0)

    def cond(state):
        _, r, _, _, it = state
        return jnp.logical_and(resid_norm(r) >= tol_field, it < max_iter)

    def body(state):
        x, r, p, rz, it = state
        ap = matvec(p)
        p_ap = _tree_dot(p, ap)
        # plain CG steps; guard only exact-zero divisions (converged/breakdown).
        # Zeroing the step on a non-PD direction would stall the loop without
        # progress; taking it keeps CG effective even on borderline systems
        # (polarization-catastrophe configurations), and max_iter still bounds
        # the loop with converged=False reported.
        alpha = jnp.where(p_ap != 0.0, rz / jnp.where(p_ap == 0.0, 1.0, p_ap), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = _tree_dot(r, z)
        beta = jnp.where(rz != 0.0, rz_new / jnp.where(rz == 0.0, 1.0, rz), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    x, r, _, _, n_iter = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, 0))
    return x, resid_norm(r) < tol_field, n_iter


def _jacobi(matvec, b, damping, x0, max_iter, tol_field, site_mask):
    """Damped Jacobi U <- U - field * pol / DIELECTRIC (reference:
    admp/pme.py:132-138) as a while_loop; field = A U - b."""

    def cond(state):
        _, r, it = state
        return jnp.logical_and(
            jnp.max(jnp.abs(r * site_mask)) >= tol_field, it < max_iter
        )

    def body(state):
        x, r, it = state
        x = x + damping * r  # field = -r, update U <- U - field * damping
        r = b - matvec(x)
        return (x, r, it + 1)

    r0 = b - matvec(x0)
    x, r, n_iter = jax.lax.while_loop(cond, body, (x0, r0, 0))
    return x, jnp.max(jnp.abs(r * site_mask)) < tol_field, n_iter


def make_induced_dipole_solver(field_fn, config: SCFConfig = SCFConfig(),
                               matvec_fn=None):
    """Build a differentiable SCF solver.

    Args:
      field_fn: (u, inputs) -> field, the gradient of the total energy with
        respect to the induced dipoles u (shape (N, 3)); linear in u.
      config: solver configuration.
      matvec_fn: optional (v, inputs) -> A v, the u-Hessian applied to v —
        mathematically field_fn(v) - field_fn(0), but implementable at a
        fraction of the cost (only the u-quadratic terms: no permanent
        interaction tensors, dipole-only mesh; see
        models/pme.py make_induced_quadratic_energy). Used for every PCG
        iteration of the forward solve AND the implicit-adjoint solve inside
        each force evaluation. (An explicit two-phase prepared matvec with
        its invariants cached outside the loop measured SLOWER — XLA CSE
        already shares those subgraphs with the surrounding energy graph;
        see models/pme.py _build_polarizable for the measured numbers.)

    Returns:
      solve(inputs, u_init, pol) -> (u_star, (converged, n_iter)). Differentiable
      in ``inputs`` via the implicit adjoint; ``u_init`` and the preconditioner
      are gradient-free.
    """

    def _setup(inputs, pol):
        """Matvec + preconditioner pieces shared by forward and adjoint.

        Does NOT build the right-hand side: with a dedicated ``matvec_fn``
        neither the adjoint solve nor the PCG forward needs ``field(0)`` —
        the forward starts from ``r0 = -field(u0)`` (one field build instead
        of field(0) + matvec(u0)), the adjoint from ``r0 = g`` (x0 = 0)."""
        pol_ng = jax.lax.stop_gradient(pol)
        inputs_ng = jax.lax.stop_gradient(inputs)
        site_mask = (pol_ng > config.pol_eps).astype(pol_ng.dtype)[:, None]
        # Jacobi preconditioner ~ A_diag^-1 = max(pol, 1e-8)/DIELECTRIC —
        # the SAME floor the polarization penalty applies
        # (ops/selfenergy.py:44), so zero-polarizability sites get their
        # true (huge) diagonal instead of a ZERO preconditioner entry.
        # With pol/DIELECTRIC those components never enter the Krylov
        # space: the forward solve hid that by masking them out of its
        # residual norm, but the adjoint solve (which must converge on ALL
        # sites — cotangents land on zero-pol sites too) could NEVER reach
        # any tolerance and burned its full iteration cap on every force
        # call (measured: 1.12-1.59 s/step on the 3000-atom bench).
        diag = (jnp.maximum(pol_ng, 1e-8) / DIELECTRIC)[:, None]

        if matvec_fn is not None:
            def matvec(v):
                return matvec_fn(v, inputs_ng)
        else:
            zero_u = jnp.zeros((pol.shape[0], 3), dtype=pol_ng.dtype)
            field_at_zero = field_fn(zero_u, inputs_ng)

            def matvec(v):
                return field_fn(v, inputs_ng) - field_at_zero

        return matvec, inputs_ng, diag, site_mask

    def _solve_impl(inputs, u_init, pol):
        matvec, inputs_ng, diag, site_mask = _setup(inputs, pol)
        u0 = jax.lax.stop_gradient(u_init)
        if config.method == "jacobi":
            zero_u = jnp.zeros_like(u0)
            b = -field_fn(zero_u, inputs_ng)
            return _jacobi(
                matvec, b, diag, u0, config.max_iter, config.field_tol, site_mask
            )
        # r0 = b - A u0 = -field(u0): one field build replaces the
        # field(0) + matvec(u0) pair (PCG never references b again)
        r0 = -field_fn(u0, inputs_ng)
        precond = lambda r: r * diag
        if config.fixed_iters is not None:
            return _pcg_fixed(
                matvec, r0, precond, u0, config.fixed_iters, config.field_tol,
                site_mask,
            )
        return _pcg(
            matvec, r0, precond, u0, config.max_iter, config.field_tol,
            site_mask,
        )

    @jax.custom_vjp
    def solve(inputs, u_init, pol):
        u, converged, n_iter = _solve_impl(inputs, u_init, pol)
        return u, (converged, n_iter)

    def solve_fwd(inputs, u_init, pol):
        out = solve(inputs, u_init, pol)
        return out, (out[0], inputs, pol)

    def solve_bwd(residuals, cotangents):
        u_star, inputs, pol = residuals
        g, _ = cotangents  # cotangent of u*, diagnostics are non-differentiable
        if not config.exact_adjoint:
            # Feynman-Hellmann mode: u* is treated as the exact variational
            # optimum, so the solve contributes no gradient (the energy's
            # dependence on theta flows through the separate direct
            # evaluation at u*). This is the reference's stop_gradient
            # behavior (admp/pme.py:114-125); error is O(SCF residual).
            return (
                jax.tree_util.tree_map(jnp.zeros_like, inputs),
                jnp.zeros_like(u_star),
                jnp.zeros_like(pol),
            )
        matvec, _, diag, site_mask = _setup(inputs, pol)
        precond = lambda r: r * diag
        # adjoint solve A w = g (A symmetric); relative tolerance on the
        # cotangent. x0 = 0, so r0 = g exactly — no matvec(0) evaluation.
        # The tolerance is floored at 40*eps of the working dtype: an f32
        # PCG cannot reduce the residual below its rounding floor, and an
        # unreachable target (the f64-grade 1e-8 default on an f32 TPU
        # pipeline) otherwise burns the full 4*max_iter iteration cap on
        # EVERY force call (measured: 1.12 s/step vs 71 ms at 3 iterations
        # on the 3000-atom bench, examples/pol_ablation_tpu.out). At the
        # floor (~4.8e-6 relative for f32) the adjoint correction — itself
        # O(SCF residual) — keeps far more accuracy than the f32 force
        # pipeline can represent.
        eps = jnp.finfo(jnp.result_type(g)).eps
        adj_tol = jnp.maximum(config.adjoint_tol, 40.0 * eps)
        g_scale = jnp.maximum(jnp.max(jnp.abs(g)), 1e-30)
        if config.adjoint_fixed_iters is not None:
            w, _, _ = _pcg_fixed(
                matvec, g, precond, jnp.zeros_like(g),
                config.adjoint_fixed_iters, adj_tol * g_scale,
                jnp.ones_like(site_mask),
            )
        else:
            w, _, _ = _pcg(
                matvec,
                g,
                precond,
                jnp.zeros_like(g),
                4 * config.max_iter,
                adj_tol * g_scale,
                jnp.ones_like(site_mask),
            )
        # theta_bar = - (d field / d theta)^T w  evaluated at u*
        _, vjp_fn = jax.vjp(lambda inp: field_fn(u_star, inp), inputs)
        (inputs_bar,) = vjp_fn(-w)
        return (
            inputs_bar,
            jnp.zeros_like(u_star),
            jnp.zeros_like(pol),
        )

    solve.defvjp(solve_fwd, solve_bwd)
    return solve
