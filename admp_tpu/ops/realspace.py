"""Real-space multipolar Ewald: screened interaction tensors and the pair energy.

Feature parity with reference: admp/pme.py:258-475 (coefficients) and
admp/pme.py:479-729 (kernel + pair expansion), redesigned TPU-first:

* The reference unrolls the quasi-internal-frame contraction channel by channel
  over ~150 lines (admp/pme.py:525-624). Observing the structure, the pair energy
  is exactly a bilinear form
      E_pair = qiQJ^T  T(r)  qiQI
  where T is a sparse 9x9 matrix whose nonzeros are the screened interaction
  coefficients: symmetric entries for even-parity couplings (cc, dd, cq, qq) and
  antisymmetric for odd (cd, dq). The induced-dipole couplings add
      E_ind = 1/2 qiQJ^T G  qiUI + 1/2 qiQI^T G' qiUJ + qiUJ^T D2 qiUI
  with G' = G sign-flipped on even-parity rows. The code below evaluates these
  contractions directly; identical math, a fraction of the code, and pure
  elementwise VPU work over the pair batch.
* Everything is fixed-shape and masked: padded / self pairs flow through with
  sanitized distances and are zeroed in the final sum (no host-side pair
  filtering as in admp/pme.py:671, which defeats jit).

All inputs are batched over pairs with no vmap needed.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

from admp_tpu.utils.accmath import exp_accurate
from admp_tpu.utils.constants import DEFAULT_THOLE_WIDTH, DIELECTRIC, SQRT_PI
from admp_tpu.ops.harmonics import rotate_harm_components as _rotate_harm_soa
from admp_tpu.utils.linalg3 import inv3x3


def _comp(q, k):
    """Component k of a multipole set: (C,) from a tuple of components (SoA)
    or a trailing-axis slice of an (..., H) array (AoS)."""
    if isinstance(q, (tuple, list)):
        return q[k]
    return q[..., k]


@jax.custom_vjp
def take_rows_sorted(table, idx):
    """Row gather ``table[idx]`` whose transpose is a SORTED segment-sum.

    The scatter-add transposes of the per-pair row gathers are the dominant
    backward cost of the real-space pass at scale (~10-14 ns per random row
    regardless of row width; ROADMAP round-3 continuation 5). When ``idx`` is
    non-decreasing — pair lists from this package's neighbor lists are
    emitted i-sorted — ``segment_sum(indices_are_sorted=True)`` replaces the
    random scatter (measured 28.5 vs 39.8 ms per 1.7M-row pass at 98k atoms).

    CONTRACT: ``idx`` MUST be non-decreasing. The forward output is identical
    either way; an unsorted ``idx`` silently corrupts gradients. Higher-order
    differentiation is exact (the backward is a linear segment-sum whose own
    AD rules are correct, merely without the sorted fast path)."""
    return table[idx]


def _take_rows_sorted_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _take_rows_sorted_bwd(res, ct):
    idx, n_rows = res
    return (
        jax.ops.segment_sum(
            ct, idx, num_segments=n_rows, indices_are_sorted=True
        ),
        None,
    )


take_rows_sorted.defvjp(_take_rows_sorted_fwd, _take_rows_sorted_bwd)


def pair_displacement_components(positions, box, i, j, mask):
    """Minimum-image pair displacements + sanitized norms, component (SoA)
    form.

    The shared geometry front of every pair pipeline (the full QI kernel
    below AND the SCF uu matvec in models/pme.py): one AoS position gather
    per site, fractional-coordinate wrap (ops/pbc.pbc_shift math), masked
    norm with fill = 1 so padding pairs stay finite.

    Returns (dx, dy, dz, r, rinv, p_i, p_j) — all (C,) except the gathered
    (C, 3) positions, which callers needing raw coordinates (QI degeneracy
    seed) reuse without a second gather.
    """
    p_i, p_j = positions[i], positions[j]
    return _displacement_from_rows(p_i, p_j, box, mask) + (p_i, p_j)


def _displacement_from_rows(p_i, p_j, box, mask):
    """Displacement/norm math given already-gathered (C, 3) position rows."""
    dx = p_i[:, 0] - p_j[:, 0]
    dy = p_i[:, 1] - p_j[:, 1]
    dz = p_i[:, 2] - p_j[:, 2]
    binv = inv3x3(box)
    sa = dx * binv[0, 0] + dy * binv[1, 0] + dz * binv[2, 0]
    sb = dx * binv[0, 1] + dy * binv[1, 1] + dz * binv[2, 1]
    sc = dx * binv[0, 2] + dy * binv[1, 2] + dz * binv[2, 2]
    sa = sa - jnp.floor(sa + 0.5)
    sb = sb - jnp.floor(sb + 0.5)
    sc = sc - jnp.floor(sc + 0.5)
    dx = sa * box[0, 0] + sb * box[1, 0] + sc * box[2, 0]
    dy = sa * box[0, 1] + sb * box[1, 1] + sc * box[2, 1]
    dz = sa * box[0, 2] + sb * box[1, 2] + sc * box[2, 2]
    sq = dx * dx + dy * dy + dz * dz
    sq_safe = jnp.where(mask, sq, 1.0)
    r = jnp.where(mask, jnp.sqrt(sq_safe), jnp.ones_like(sq))
    return dx, dy, dz, r, 1.0 / r


def qi_pair_components(positions, box, q_comps, i, j, mask, lmax: int,
                       u_comps=None, i_sorted: bool = False):
    """Pair geometry + quasi-internal-frame rotation, entirely in component
    ((C,)-array) form.

    The array-of-structures formulation materializes (C, 3, 3) frames and
    (C, 9) rotated multipoles between ops; TPU tiles pad those minor dims to
    (8, 128) — up to ~40x the logical bytes — and the batched 3x3 einsums
    force the padded layouts to exist. Measured on the 3000-atom liquid box
    (53k pair capacity): the frames+rotation stage alone was 8.7 of the
    14.6 ms real-space step. Component arrays keep every intermediate a flat
    lane-packed (C,) vector; same math as ops/frames.build_quasi_internal +
    ops/harmonics.rot_global2local (reference: admp/spatial.py:149-178,
    admp/multipole.py:92-179).

    Args:
      q_comps: (N, H) harmonic multipoles (H >= (lmax+1)^2).
      u_comps: optional (N, 3) induced dipoles (harmonic z, x, y order).

    Returns:
      (r, qi_i, qi_j, ui, uj): r (C,) sanitized distances; qi_* component
      tuples in the QI frame; ui/uj component triples or None.
    """
    # Packed-row gathers: TPU gathers (and their scatter-add transposes in
    # the backward pass) are row-count bound, so positions + multipoles
    # (+ induced dipoles) are concatenated into ONE (N, 3+H(+3)) table and
    # each site costs a single row gather — halving the pair pass's
    # gather/scatter count vs separate position/multipole tables.
    n_h = (lmax + 1) ** 2
    cols = [positions, q_comps[:, :n_h]]
    if u_comps is not None and u_comps.dtype == positions.dtype:
        cols.append(u_comps)
        packed_u = True
    else:
        packed_u = False
    if q_comps.dtype == positions.dtype:
        packed = jnp.concatenate(cols, axis=1)
        g_i = take_rows_sorted(packed, i) if i_sorted else packed[i]
        g_j = packed[j]
        p_i, p_j = g_i[:, :3], g_j[:, :3]
        qg_i, qg_j = g_i[:, 3:3 + n_h], g_j[:, 3:3 + n_h]
    else:  # mixed-precision modes keep separate gathers
        p_i, p_j = positions[i], positions[j]
        qg_i, qg_j = q_comps[i, :n_h], q_comps[j, :n_h]
        packed_u = False
    dx, dy, dz, r, rinv = _displacement_from_rows(p_i, p_j, box, mask)
    yi, zi = p_i[:, 1], p_i[:, 2]
    yj, zj = p_j[:, 1], p_j[:, 2]

    # quasi-internal frame (ops/frames.build_quasi_internal): z along dr,
    # x from a degeneracy-aware seed orthogonalized against z
    fzx, fzy, fzz = dx * rinv, dy * rinv, dz * rinv
    degenerate = jnp.logical_and(yi == yj, zi == zj)
    one = jnp.ones_like(r)
    seedx = jnp.where(degenerate, 0.0 * one, one)
    seedy = one - seedx
    vx = fzx + seedx
    vy = fzy + seedy
    vz = fzz
    dot = fzx * vx + fzy * vy + fzz * vz
    vx = vx - fzx * dot
    vy = vy - fzy * dot
    vz = vz - fzz * dot
    # safe_normalize (utils/safety): ~zero vectors map to zero
    nsq = vx * vx + vy * vy + vz * vz
    small = nsq < 1e-12
    ninv = jnp.where(
        small, 0.0, 1.0 / jnp.sqrt(jnp.where(small, 1.0, nsq))
    )
    fxx, fxy, fxz = vx * ninv, vy * ninv, vz * ninv
    # y = z x x
    fyx = fzy * fxz - fzz * fxy
    fyy = fzz * fxx - fzx * fxz
    fyz = fzx * fxy - fzy * fxx

    frame = (fxx, fxy, fxz, fyx, fyy, fyz, fzx, fzy, fzz)
    q_i = tuple(qg_i[:, k] for k in range(n_h))
    q_j = tuple(qg_j[:, k] for k in range(n_h))
    qi_i = _rotate_harm_soa(q_i, frame, lmax)
    qi_j = _rotate_harm_soa(q_j, frame, lmax)

    ui = uj = None
    if u_comps is not None:
        if packed_u:
            ug_i, ug_j = g_i[:, 3 + n_h:], g_j[:, 3 + n_h:]
        else:
            ug_i, ug_j = u_comps[i], u_comps[j]
        zero = jnp.zeros_like(r)
        ui = _rotate_harm_soa(
            (zero, ug_i[:, 0], ug_i[:, 1], ug_i[:, 2]), frame, 1
        )[1:]
        uj = _rotate_harm_soa(
            (zero, ug_j[:, 0], ug_j[:, 1], ug_j[:, 2]), frame, 1
        )[1:]
    return r, qi_i, qi_j, ui, uj


def ewald_screening_s(kr, x, mscale, erfc_fn=erfc):
    """Cancellation-free screening sums s_l = mscale + b_l + [l==2] kr x.

    The reference builds b_l = -erf(kr) + sum 2^m (kr)^(2m-1) x / (2m-1)!!
    (admp/pme.py:290-300) and later forms ``mscale + b2 - kr x`` etc. — for
    full-strength pairs (mscale = 1) that evaluates 1 - erf(kr) by explicit
    subtraction, which in float32 leaves an *absolute* erf rounding of ~6e-8
    on a result that decays like erfc (5e-4 at kr = 2.5): up to ~28% relative
    error on distant-pair coefficients (measured). Regrouping as
        mscale + b2 - kr x           = (mscale - 1) + erfc(kr)
        mscale + b2      (=: s2x)    = (mscale - 1) + erfc(kr) + kr x
        mscale + b3      (=: s3)     = s2x + (2/3) kr^3 x
        mscale + b4      (=: s4)     = s3 + (4/15) kr^5 x
    makes every term positive for mscale = 1 (no cancellation; f32 relative
    error ~ the erfc implementation's own 1e-6 max at the decayed tail).

    Returns (s2, s2x, s3, s4).
    """
    kr2 = kr * kr
    kr3 = kr2 * kr
    kr5 = kr3 * kr2
    ms1 = mscale - 1.0
    s2 = ms1 + erfc_fn(kr)
    s2x = s2 + kr * x
    s3 = s2x + (2.0 / 3.0) * kr3 * x
    s4 = s3 + (4.0 / 15.0) * kr5 * x
    return s2, s2x, s3, s4


def perm_coefficients(r, mscale, kappa, lmax: int):
    """Screened permanent-multipole interaction coefficients in the QI frame.

    Returns dict with cc, cd, dd_m0, dd_m1, cq, dq_m0, dq_m1, qq_m0, qq_m1, qq_m2
    (each shaped like ``r``). Parity with reference: admp/pme.py:258-334, in
    the cancellation-free erfc regrouping of :func:`ewald_screening_s`
    (algebraically identical; s2 = mscale+b2-kr x, s2x = mscale+b2,
    s3 = mscale+b3, s4 = mscale+b4, and dd_m1's mscale+b3-(2/3)kr^3 x = s2x,
    qq_m2's mscale+b4-(4/15)kr^5 x = s3).
    """
    kr = kappa * r
    x = 2.0 * exp_accurate(-(kr * kr)) / SQRT_PI
    return perm_coefficients_from_screening(r, kr, x, mscale, lmax)


def perm_coefficients_from_screening(r, kr, x, mscale, lmax: int,
                                     erfc_fn=erfc):
    """perm_coefficients given the precomputed screening pieces kr = kappa r
    and x = (2/sqrt(pi)) exp(-kr^2) — split out so the fused Pallas pair
    kernel (ops/pallas/pairs.py) can supply its Mosaic-lowerable gaussian
    and erfc while sharing every coefficient expression with this XLA
    path."""
    r_inv = 1.0 / r
    d1 = DIELECTRIC * r_inv
    d2 = d1 * r_inv
    d3 = d2 * r_inv
    d4 = d3 * r_inv
    d5 = d4 * r_inv
    kr2 = kr * kr
    kr3 = kr2 * kr
    kr5 = kr3 * kr2
    s2, s2x, s3, s4 = ewald_screening_s(kr, x, mscale, erfc_fn)

    out = {"cc": d1 * s2}
    if lmax >= 1:
        out["cd"] = d2 * s2x
        out["dd_m0"] = -2.0 / 3.0 * d3 * (3.0 * s3 + kr3 * x)
        out["dd_m1"] = d3 * s2x
    if lmax >= 2:
        out["cq"] = d3 * s3
        out["dq_m0"] = d4 * (3.0 * s3 + (4.0 / 3.0) * kr5 * x)
        # python-float sqrt(3): jnp.sqrt(3.0) under jax_enable_x64 traces an
        # f64 sqrt INSIDE consumers' graphs (Mosaic cannot legalize f64
        # sqrt/truncf in the pair kernels; weak-typed python floats adapt)
        out["dq_m1"] = -math.sqrt(3.0) * d4 * s3
        out["qq_m0"] = d5 * (
            6.0 * s4 + (4.0 / 45.0) * (-3.0 + 10.0 * kr2) * kr5 * x
        )
        out["qq_m1"] = -(4.0 / 15.0) * d5 * (15.0 * s4 + kr5 * x)
        out["qq_m2"] = d5 * s3
    return out


def thole_factor_complements(u_scaled, exp_fn=exp_accurate):
    """Thole damping factor *complements* (c-1, d0-1, d1-1, q0-1, q1-1) given
    au = a * r / dmp.

    Parity with reference: admp/pme.py:418-432 (which forms 1 - exp(-au)(...)),
    returned as the exact complements -exp(-au)(...) so callers can regroup
    the screened coefficients cancellation-free (see ewald_screening_s): at
    large au the damping factor is 1 to within f32 epsilon and the subtraction
    would destroy the tiny complement that actually carries the physics.
    The exp overflow clamp at au > 50 becomes a plain where.
    """
    au = u_scaled
    exp_au = jnp.where(au < 50.0, exp_fn(-jnp.minimum(au, 50.0)), 0.0)
    au2 = au * au
    au3 = au2 * au
    au4 = au3 * au
    cm = -exp_au * (1.0 + au + 0.5 * au2)
    d0m = -exp_au * (1.0 + au + 0.5 * au2 + au3 / 4.0)
    d1m = cm
    q0m = -exp_au * (1.0 + au + 0.5 * au2 + au3 / 6.0 + au4 / 18.0)
    q1m = -exp_au * (1.0 + au + 0.5 * au2 + au3 / 6.0)
    return cm, d0m, d1m, q0m, q1m


def induced_coefficients(r, thole1, thole2, dmp, pscale, kappa, lmax: int,
                         erfc_fn=erfc, exp_fn=exp_accurate):
    """Screened induced-dipole interaction coefficients.

    Returns dict with cud, dud_m0, dud_m1, udq_m0, udq_m1, udud_m0, udud_m1.
    Parity with reference: admp/pme.py:379-475. ``uscale`` is fixed to 1 there
    (admp/pme.py:472) and here. ``erfc_fn``/``exp_fn`` let the fused Pallas
    pair kernel substitute Mosaic-lowerable implementations (see
    ops/pallas/pairs.py).
    """
    # Thole width: DEFAULT for real interacting pairs (pscale ~ 0), thole1+thole2
    # for scaled intramolecular pairs — a Fermi switch on pscale
    # (reference: admp/pme.py:411, switch_val at :337-348).
    uu = (pscale - 1e-3) / 1e-5
    w0 = 1.0 / (jnp.exp(jnp.clip(uu, -60.0, 60.0)) + 1.0)
    a = w0 * DEFAULT_THOLE_WIDTH + (1.0 - w0) * (thole1 + thole2)

    dmp_safe = jnp.maximum(dmp, 1e-8)
    u = jnp.minimum(r / dmp_safe, 1e8)
    tcm, td0m, td1m, tq0m, tq1m = thole_factor_complements(a * u, exp_fn)

    r_inv = 1.0 / r
    d2 = DIELECTRIC * r_inv * r_inv
    d3 = d2 * r_inv
    d4 = d3 * r_inv
    kr = kappa * r
    kr2 = kr * kr
    kr3 = kr2 * kr
    kr5 = kr3 * kr2
    x = 2.0 * exp_fn(-kr2) / SQRT_PI
    # cancellation-free regrouping (see ewald_screening_s):
    #   pscale * t + b2            = pscale * (t-1) + (pscale-1) + erfc + kr x
    #   pscale * t + b3            = ... + (2/3) kr^3 x
    #   pscale * t + b3 - 2/3kr^3x = pscale * (t-1) + (pscale-1) + erfc + kr x
    # (uscale = 1 terms drop the (pscale-1); reference: admp/pme.py:472)
    ps1 = pscale - 1.0
    e2 = erfc_fn(kr) + kr * x
    e3 = e2 + (2.0 / 3.0) * kr3 * x

    out = {"cud": 2.0 * d2 * (pscale * tcm + ps1 + e2)}
    if lmax >= 1:
        out["dud_m0"] = -4.0 / 3.0 * d3 * (
            3.0 * (pscale * td0m + ps1 + e3) + kr3 * x
        )
        out["dud_m1"] = 2.0 * d3 * (pscale * td1m + ps1 + e2)
    if lmax >= 2:
        out["udq_m0"] = 2.0 * d4 * (
            3.0 * (pscale * tq0m + ps1 + e3) + 4.0 / 3.0 * kr5 * x
        )
        out["udq_m1"] = -2.0 * math.sqrt(3.0) * d4 * (pscale * tq1m + ps1 + e3)
    # induced-induced, uscale = 1
    out["udud_m0"] = -2.0 / 3.0 * d3 * (3.0 * (td0m + e3) + kr3 * x)
    out["udud_m1"] = d3 * (td1m + e2)
    return out


def pair_energy_perm(qi_i, qi_j, coef, lmax: int):
    """Permanent-permanent pair energy: qiQJ^T T qiQI with T as documented above.

    Verified equivalent to the unrolled reference kernel (admp/pme.py:525-624):
    E = 0.5 (qiQJ . Vij + qiQI . Vji) with Vij = T qiQI, Vji = T^T qiQJ
    collapses to qiQJ^T T qiQI.
    """
    e = coef["cc"] * _comp(qi_j, 0) * _comp(qi_i, 0)
    if lmax >= 1:
        # antisymmetric charge-dipole: -cd (qj0 qi1 - qj1 qi0)
        e = e + coef["cd"] * (
            _comp(qi_j, 1) * _comp(qi_i, 0) - _comp(qi_j, 0) * _comp(qi_i, 1)
        )
        e = e + coef["dd_m0"] * _comp(qi_j, 1) * _comp(qi_i, 1)
        e = e + coef["dd_m1"] * (
            _comp(qi_j, 2) * _comp(qi_i, 2) + _comp(qi_j, 3) * _comp(qi_i, 3)
        )
    if lmax >= 2:
        # symmetric charge-quadrupole
        e = e + coef["cq"] * (
            _comp(qi_j, 0) * _comp(qi_i, 4) + _comp(qi_j, 4) * _comp(qi_i, 0)
        )
        # antisymmetric dipole-quadrupole
        e = e + coef["dq_m0"] * (
            _comp(qi_j, 1) * _comp(qi_i, 4) - _comp(qi_j, 4) * _comp(qi_i, 1)
        )
        e = e + coef["dq_m1"] * (
            _comp(qi_j, 2) * _comp(qi_i, 5)
            - _comp(qi_j, 5) * _comp(qi_i, 2)
            + _comp(qi_j, 3) * _comp(qi_i, 6)
            - _comp(qi_j, 6) * _comp(qi_i, 3)
        )
        e = e + coef["qq_m0"] * _comp(qi_j, 4) * _comp(qi_i, 4)
        e = e + coef["qq_m1"] * (
            _comp(qi_j, 5) * _comp(qi_i, 5) + _comp(qi_j, 6) * _comp(qi_i, 6)
        )
        e = e + coef["qq_m2"] * (
            _comp(qi_j, 7) * _comp(qi_i, 7) + _comp(qi_j, 8) * _comp(qi_i, 8)
        )
    return e


def pair_energy_induced(qi_i, qi_j, ui, uj, icoef, lmax: int):
    """Induced-dipole contributions to the pair energy.

    E_ind = 1/2 [ qiQJ . (G ui) + qiQI . (G' uj) ] + uj . (D2 ui)
    with G rows (charge, dip_z, dip_x, dip_y, quad...) as documented in the
    module docstring. Parity with the lpol branches of reference:
    admp/pme.py:527-607,621-624.
    """
    # qiQJ^T G ui : rows with even-parity source (charge/quad) carry -ui coupling
    e_ju = -icoef["cud"] * _comp(qi_j, 0) * _comp(ui, 0)
    e_iu = icoef["cud"] * _comp(qi_i, 0) * _comp(uj, 0)
    if lmax >= 1:
        e_ju = e_ju + icoef["dud_m0"] * _comp(qi_j, 1) * _comp(ui, 0) + icoef[
            "dud_m1"
        ] * (_comp(qi_j, 2) * _comp(ui, 1) + _comp(qi_j, 3) * _comp(ui, 2))
        e_iu = e_iu + icoef["dud_m0"] * _comp(qi_i, 1) * _comp(uj, 0) + icoef[
            "dud_m1"
        ] * (_comp(qi_i, 2) * _comp(uj, 1) + _comp(qi_i, 3) * _comp(uj, 2))
    if lmax >= 2:
        e_ju = e_ju - icoef["udq_m0"] * _comp(qi_j, 4) * _comp(ui, 0) - icoef[
            "udq_m1"
        ] * (_comp(qi_j, 5) * _comp(ui, 1) + _comp(qi_j, 6) * _comp(ui, 2))
        e_iu = e_iu + icoef["udq_m0"] * _comp(qi_i, 4) * _comp(uj, 0) + icoef[
            "udq_m1"
        ] * (_comp(qi_i, 5) * _comp(uj, 1) + _comp(qi_i, 6) * _comp(uj, 2))
    e_uu = icoef["udud_m0"] * _comp(uj, 0) * _comp(ui, 0) + icoef["udud_m1"] * (
        _comp(uj, 1) * _comp(ui, 1) + _comp(uj, 2) * _comp(ui, 2)
    )
    return 0.5 * (e_ju + e_iu) + e_uu


def induced_uu_coefficients(r, thole1, thole2, dmp, pscale, kappa,
                            erfc_fn=erfc, exp_fn=exp_accurate):
    """Only the induced-induced (udud) screened coefficients.

    The SCF matvec A v needs just the u-quadratic part of the energy; the
    charge/dipole/quadrupole-to-induced couplings (cud, dud, udq) are linear
    in u and cancel in field(v) - field(0). Computing only udud keeps the
    per-iteration cost of the PCG solve (and of every implicit-VJP adjoint
    solve inside a force evaluation) to a fraction of a full field build.
    ``pscale`` enters only through the Thole-width switch (the uu scale itself
    is 1, reference: admp/pme.py:472).
    """
    uu = (pscale - 1e-3) / 1e-5
    w0 = 1.0 / (jnp.exp(jnp.clip(uu, -60.0, 60.0)) + 1.0)
    a = w0 * DEFAULT_THOLE_WIDTH + (1.0 - w0) * (thole1 + thole2)

    dmp_safe = jnp.maximum(dmp, 1e-8)
    u = jnp.minimum(r / dmp_safe, 1e8)
    au = a * u
    exp_au = jnp.where(au < 50.0, exp_fn(-jnp.minimum(au, 50.0)), 0.0)
    au2 = au * au
    au3 = au2 * au
    td0m = -exp_au * (1.0 + au + 0.5 * au2 + au3 / 4.0)
    td1m = -exp_au * (1.0 + au + 0.5 * au2)

    r_inv = 1.0 / r
    d3 = DIELECTRIC * r_inv * r_inv * r_inv
    kr = kappa * r
    kr2 = kr * kr
    kr3 = kr2 * kr
    x = 2.0 * exp_fn(-kr2) / SQRT_PI
    e2 = erfc_fn(kr) + kr * x
    e3 = e2 + (2.0 / 3.0) * kr3 * x
    udud_m0 = -2.0 / 3.0 * d3 * (3.0 * (td0m + e3) + kr3 * x)
    udud_m1 = d3 * (td1m + e2)
    return udud_m0, udud_m1


def pair_damping_width(pol_i, pol_j):
    """Thole distance rescaling (pol_i pol_j)^(1/6), reference: admp/pme.py:732-735.

    The product is floored (reference: post-hoc trim_val_0,
    admp/pme.py:413,362) with the double-where guard so derivatives of EVERY
    order stay finite at zero-polarizability sites: a bare
    ``maximum(prod, eps) ** (1/6)`` evaluates pow' at the clamp point, which
    overflows f32 below ~1e-36 and poisons dE/dpol (and, through the
    Hessian-vector pair kernel, everything) with Inf * 0 = NaN. The 1e-36
    floor (width 1e-6) only engages for products 16+ orders below any
    physical polarizability pair, where the Thole factor is 1 to f32
    precision either way.
    """
    prod = pol_i * pol_j
    small = prod <= 1e-36
    prod_safe = jnp.where(small, jnp.ones_like(prod), prod)
    return jnp.where(small, jnp.full_like(prod, 1e-6),
                     prod_safe ** (1.0 / 6.0))
