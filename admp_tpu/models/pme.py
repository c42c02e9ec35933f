"""Multipolar electrostatic PME with optional Thole polarization.

Feature parity with reference: admp/pme.py (ADMPPmeForce at pme.py:30-143,
energy_pme at pme.py:176-254, pme_real at pme.py:628-729), redesigned TPU-first:

* One jit boundary around the *entire* energy/force step (frames, real space,
  spreading, FFT, self terms, SCF). The reference deliberately leaves pme_real
  un-jitted because its pair count changes shape (admp/pme.py:636-638); here
  pairs are fixed-capacity masked arrays so the step compiles once.
* The induced-dipole SCF is an on-device PCG ``lax.while_loop`` with an
  implicit-function custom VJP (see scf/solver.py) instead of a host-synced
  Jacobi loop with truncated gradients (admp/pme.py:111-143).
* The reference bug where the lmax==0 && lpol branch reads an unassigned
  variable (admp/pme.py:226-227) is fixed here: charges are promoted to an
  lmax=1 harmonic array before induced dipoles are merged.

The class mirrors the reference's public surface (init signature, update_env,
get_energy/get_forces, U_ind warm-start state, optimize_Uind) so reference users
can switch without code changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from admp_tpu.ops import realspace
from admp_tpu.ops.ewald import setup_ewald_parameters
from admp_tpu.ops.frames import build_quasi_internal, construct_local_frames
from admp_tpu.ops.harmonics import (
    cart_dipole_to_harm,
    rot_dipole_global2local,
    rot_global2local,
    rot_local2global,
)
from admp_tpu.ops.influence import ck_1
from admp_tpu.ops.pbc import pbc_shift
from admp_tpu.ops.reciprocal import make_pme_recip
from admp_tpu.ops.selfenergy import pme_self_energy, polarization_penalty
from admp_tpu.scf.solver import make_induced_dipole_solver
from admp_tpu.settings import SCFConfig, maybe_jit
from admp_tpu.utils.constants import DIELECTRIC
from admp_tpu.utils.safety import masked_norm


def pme_real_energy(
    positions,
    box,
    pairs,
    q_global,
    u_ind_harm,
    pol,
    tholes,
    m_scales,
    p_scales,
    covalent_map,
    kappa,
    lmax: int,
    lpol: bool,
    pair_chunk: int | None = None,
):
    """Real-space multipolar Ewald energy over a padded pair list.

    Parity with reference: admp/pme.py:628-729 (pair expansion) +
    admp/pme.py:479-624 (kernel), via the bilinear-form contraction of
    ops/realspace.py. ``pairs`` may contain padding (i >= j) which is masked.

    ``pair_chunk``: process the pair list in fixed-size blocks via lax.map —
    bounds peak memory for very large systems (per-pair intermediates like the
    quasi-internal frames tile-pad badly on TPU at tens of millions of pairs).
    """
    if pair_chunk is not None and pairs.shape[0] > pair_chunk:
        n_pad = (-pairs.shape[0]) % pair_chunk
        padded = jnp.concatenate(
            [pairs, jnp.full((n_pad, 2), positions.shape[0], pairs.dtype)]
        )
        blocks = padded.reshape(-1, pair_chunk, 2)
        energies = jax.lax.map(
            lambda blk: pme_real_energy(
                positions, box, blk, q_global, u_ind_harm, pol, tholes,
                m_scales, p_scales, covalent_map, kappa, lmax, lpol,
            ),
            blocks,
        )
        return jnp.sum(energies)
    n = positions.shape[0]
    raw_i, raw_j = pairs[..., 0], pairs[..., 1]
    mask = raw_i < raw_j
    i = jnp.minimum(raw_i, n - 1)
    j = jnp.minimum(raw_j, n - 1)

    box_inv = jnp.linalg.inv(box)
    r1 = positions[i]
    r2 = positions[j]
    dr = pbc_shift(r1 - r2, box, box_inv)
    r = masked_norm(dr, mask)

    frames_qi = build_quasi_internal(r1, r2, dr, r)
    qi_i = rot_global2local(q_global[i], frames_qi, lmax)
    qi_j = rot_global2local(q_global[j], frames_qi, lmax)

    from admp_tpu.ops.exclusions import lookup_topology_distance

    nbond = lookup_topology_distance(covalent_map, i, j)
    mscale = m_scales[(nbond - 1) % m_scales.shape[0]]

    coef = realspace.perm_coefficients(r, mscale, kappa, lmax)
    e = realspace.pair_energy_perm(qi_i, qi_j, coef, lmax)

    if lpol:
        pscale = p_scales[(nbond - 1) % p_scales.shape[0]]
        ui = rot_dipole_global2local(u_ind_harm[i], frames_qi)
        uj = rot_dipole_global2local(u_ind_harm[j], frames_qi)
        dmp = realspace.pair_damping_width(pol[i], pol[j])
        icoef = realspace.induced_coefficients(
            r, tholes[i], tholes[j], dmp, pscale, kappa, lmax
        )
        e = e + realspace.pair_energy_induced(qi_i, qi_j, ui, uj, icoef, lmax)

    return jnp.sum(jnp.where(mask, e, 0.0))


def energy_pme(
    positions,
    box,
    pairs,
    q_local,
    u_ind_cart,
    pol,
    tholes,
    m_scales,
    p_scales,
    d_scales,
    covalent_map,
    axis_types,
    axis_indices,
    pme_recip_fn,
    kappa,
    lmax: int,
    lpol: bool,
    pair_chunk: int | None = None,
):
    """Total multipolar PME energy: real + reciprocal + self (+ polarization).

    Parity with reference: admp/pme.py:176-254. ``u_ind_cart`` are Cartesian
    induced dipoles (global frame); ``d_scales`` is accepted for API parity but,
    as in the reference (admp/pme.py:472, uscales hardcoded to 1), unused.
    """
    del d_scales
    if lmax > 0:
        frames = construct_local_frames(positions, box, axis_types, axis_indices)
        q_global = rot_local2global(q_local, frames, lmax)
    else:
        q_global = q_local

    lmax_eff = lmax
    if lpol:
        if lmax == 0:
            # promote charges to an lmax=1 array so induced dipoles have slots
            # (fixes reference bug admp/pme.py:226-227)
            q_global = jnp.concatenate(
                [q_global, jnp.zeros((q_global.shape[0], 3), q_global.dtype)], axis=-1
            )
            lmax_eff = 1
        u_harm = cart_dipole_to_harm(u_ind_cart)
        q_tot = q_global.at[:, 1:4].add(u_harm)
    else:
        u_harm = None
        q_tot = q_global

    e_real = pme_real_energy(
        positions,
        box,
        pairs,
        q_global,
        u_harm,
        pol,
        tholes,
        m_scales,
        p_scales,
        covalent_map,
        kappa,
        lmax_eff,
        lpol,
        pair_chunk,
    )
    e_recip = pme_recip_fn(positions, box, q_tot)
    e_self = pme_self_energy(q_tot, kappa, lmax_eff)
    if lpol:
        e_self = e_self + polarization_penalty(u_ind_cart, pol)
    return e_real + e_recip + e_self


class ADMPPmeForce:
    """Multipolar PME calculator with the reference's public surface
    (reference: admp/pme.py:30-143)."""

    def __init__(
        self,
        box,
        axis_type,
        axis_indices,
        covalent_map,
        rc,
        ethresh,
        lmax,
        lpol=False,
        scf_config: SCFConfig | None = None,
        fft_friendly_grid: bool = False,
        spread_method: str = "scatter",
        spread_precision: str | None = None,
    ):
        self.axis_type = jnp.asarray(axis_type)
        self.axis_indices = jnp.asarray(axis_indices)
        self.rc = rc
        self.ethresh = ethresh
        self.lmax = int(lmax)
        if fft_friendly_grid:
            from admp_tpu.ops.ewald import setup_ewald_parameters_fft

            kappa, k1, k2, k3 = setup_ewald_parameters_fft(rc, ethresh, box)
        else:
            kappa, k1, k2, k3 = setup_ewald_parameters(rc, ethresh, box)
        self.kappa = kappa
        self.K1, self.K2, self.K3 = k1, k2, k3
        self.pme_order = 6
        from admp_tpu.ops.exclusions import SparseExclusions

        if isinstance(covalent_map, SparseExclusions):
            self.covalent_map = covalent_map
            self.n_atoms = int(covalent_map.n_atoms)
        else:
            self.covalent_map = jnp.asarray(covalent_map)
            self.n_atoms = int(self.covalent_map.shape[0])
        self.lpol = bool(lpol)
        self.scf_config = scf_config or SCFConfig()
        self.spread_method = spread_method
        self.spread_precision = spread_precision
        self.U_ind = jnp.zeros((self.n_atoms, 3))
        self.lconverg = None
        self.n_cycle = None
        self.refresh_calculators()

    def update_env(self, attr, val):
        """Update a static environment attribute and rebuild the calculators
        (reference: admp/pme.py:89-94)."""
        setattr(self, attr, val)
        self.refresh_calculators()

    def refresh_calculators(self):
        self.pme_recip = make_pme_recip(
            ck_1,
            self.kappa,
            include_gamma=False,
            grid_shape=(self.K1, self.K2, self.K3),
            lmax=self.lmax,
            prefactor=DIELECTRIC,
            spread_method=getattr(self, "spread_method", "scatter"),
            spread_precision=getattr(self, "spread_precision", None),
        )
        if self.lpol:
            self._build_polarizable()
        else:
            self._build_fixed()

    # ------------------------------------------------------------------
    # fixed-multipole path
    # ------------------------------------------------------------------
    def _build_fixed(self):
        covalent_map = self.covalent_map
        axis_types = self.axis_type
        axis_indices = self.axis_indices
        recip = self.pme_recip
        kappa, lmax = self.kappa, self.lmax

        def get_energy(positions, box, pairs, Q_local, mScales):
            pair_chunk = (1 << 18) if pairs.shape[0] > (1 << 20) else None
            return energy_pme(
                positions, box, pairs, Q_local, None, None, None,
                mScales, None, None, covalent_map, axis_types, axis_indices,
                recip, kappa, lmax, False, pair_chunk,
            )

        self.get_energy = maybe_jit(get_energy)
        self.get_forces = maybe_jit(jax.value_and_grad(get_energy))
        self.energy_fn = self.get_energy

    # ------------------------------------------------------------------
    # polarizable path
    # ------------------------------------------------------------------
    def _build_polarizable(self):
        covalent_map = self.covalent_map
        axis_types = self.axis_type
        axis_indices = self.axis_indices
        recip = self.pme_recip
        kappa, lmax = self.kappa, self.lmax

        def energy_fn(positions, box, pairs, Q_local, U_ind, pol, tholes,
                      mScales, pScales, dScales):
            pair_chunk = (1 << 18) if pairs.shape[0] > (1 << 20) else None
            return energy_pme(
                positions, box, pairs, Q_local, U_ind, pol, tholes,
                mScales, pScales, dScales, covalent_map, axis_types,
                axis_indices, recip, kappa, lmax, True, pair_chunk,
            )

        self.energy_fn = energy_fn
        self.grad_U_fn = jax.grad(energy_fn, argnums=4)

        def field_fn(u, inputs):
            return self.grad_U_fn(
                inputs["positions"], inputs["box"], inputs["pairs"],
                inputs["Q_local"], u, inputs["pol"], inputs["tholes"],
                inputs["mScales"], inputs["pScales"], inputs["dScales"],
            )

        solver = make_induced_dipole_solver(field_fn, self.scf_config)

        def energy_and_aux(positions, box, pairs, Q_local, pol, tholes,
                           mScales, pScales, dScales, U_init):
            inputs = dict(
                positions=positions, box=box, pairs=pairs, Q_local=Q_local,
                pol=pol, tholes=tholes, mScales=mScales, pScales=pScales,
                dScales=dScales,
            )
            u_star, (converged, n_iter) = solver(inputs, U_init, pol)
            energy = energy_fn(
                positions, box, pairs, Q_local, u_star, pol, tholes,
                mScales, pScales, dScales,
            )
            return energy, (u_star, converged, n_iter)

        self._energy_and_aux = maybe_jit(energy_and_aux)
        self._value_grad_aux = maybe_jit(
            jax.value_and_grad(energy_and_aux, has_aux=True)
        )

        def get_energy(positions, box, pairs, Q_local, pol, tholes,
                       mScales, pScales, dScales, U_init=None):
            if U_init is None:
                U_init = self.U_ind
            energy, (u, conv, n_it) = self._energy_and_aux(
                positions, box, pairs, Q_local, pol, tholes,
                mScales, pScales, dScales, U_init,
            )
            self.U_ind, self.lconverg, self.n_cycle = u, conv, n_it
            return energy

        def get_forces(positions, box, pairs, Q_local, pol, tholes,
                       mScales, pScales, dScales, U_init=None):
            if U_init is None:
                U_init = self.U_ind
            (energy, (u, conv, n_it)), force = self._value_grad_aux(
                positions, box, pairs, Q_local, pol, tholes,
                mScales, pScales, dScales, U_init,
            )
            self.U_ind, self.lconverg, self.n_cycle = u, conv, n_it
            return energy, force

        self.get_energy = get_energy
        self.get_forces = get_forces

    def optimize_Uind(self, positions, box, pairs, Q_local, pol, tholes,
                      mScales, pScales, dScales, U_init=None):
        """Converge induced dipoles only (reference: admp/pme.py:111-143).

        Returns (U, converged_flag, n_iterations).
        """
        if U_init is None:
            U_init = jnp.zeros((self.n_atoms, 3))
        _, (u, conv, n_it) = self._energy_and_aux(
            positions, box, pairs, Q_local, pol, tholes,
            mScales, pScales, dScales, U_init,
        )
        return u, conv, n_it
