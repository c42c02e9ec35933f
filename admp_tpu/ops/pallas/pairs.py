"""Fused Pallas TPU kernel for the real-space pair pass (permanent terms).

Why: the pure-XLA SoA pair pipeline at 98k atoms / 1.6M pairs measures
~113 ms e+g while the arithmetic is < 1 GFLOP; the bisects
(examples/realsplit_98k_tpu.out, realsplit2_98k_tpu.out) show the cost is
neither flops nor unavoidable HBM bytes but how XLA lowers the graph around
the pair gathers: a gather whose rows are consumed WHOLE times at ~19 ms
e+g (incl. the ~10.7 ms remote-dispatch floor), while the same gather
feeding column slices + the PBC wrap times at ~92 ms. The kernel therefore
takes the two gathered per-pair row tables as-is — the only XLA-visible
consumers are whole-array Pallas operands — and does EVERYTHING else
in VMEM: the block transpose to pair-on-lanes layout, the minimum-image
wrap, the degeneracy test, the QI frame, both harmonic rotations, the
screened coefficients, and the bilinear contraction (reference:
admp/spatial.py:149-178 + admp/multipole.py:92-179 + admp/pme.py:258-334,
479-624).

Design notes:
- Per-pair quantities ride the LANE axis inside the kernel ((1, BC) rows);
  the gathered tables arrive (BC, F) and are transposed in VMEM
  (jnp.transpose lowers in Mosaic; measured kernel-on-prebuilt-inputs cost
  at 1.6M pairs is ~5 fwd / ~8 e+g ms over the dispatch floor).
- Only the two row gathers and the exclusion lookup stay in XLA, so the
  gather transposes (row scatter-adds) stay on XLA's fast whole-row path.
- box and kappa enter as SMEM scalars; the backward kernel accumulates
  their cotangents per program into an SMEM row that is reduced outside —
  box gradients (virial) are exact, nothing is silently zero. The box
  inverse is taken OUTSIDE (utils/linalg3.inv3x3) and passed as nine more
  scalars, so its chain rule runs in XLA where f64 virial modes can reuse
  it.
- The backward kernel does not hand-differentiate anything: it calls
  jax.vjp on the same block function INSIDE the kernel body, so the adjoint
  also never materializes per-pair intermediates in HBM.
- Math is shared with the XLA path via ops/realspace
  (perm_coefficients_from_screening, pair_energy_perm) and ops/harmonics
  (rotate_harm_components); the gaussian and erfc are Mosaic-lowerable
  reformulations (exp2 scaling — jnp.ldexp does not lower; Cody rational —
  jax.scipy.special.erfc does not lower), each ~1e-7 relative.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from admp_tpu.ops import realspace
from admp_tpu.ops.harmonics import rotate_harm_components
from admp_tpu.ops.pallas.vma import out_struct
from admp_tpu.utils.constants import SQRT_PI

try:  # pragma: no cover - exercised on TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_I0 = np.int32(0)

_INV_LN2 = 1.4426950408889634
_LN2_HI = 0.693359375
_LN2_LO = -2.12194440e-4

_N_SCAL = 19  # kappa + box (9) + box^-1 (9)


def pallas_pairs_available() -> bool:
    return _PALLAS_OK


def _exp_rows(y):
    """exp(y) at ~1 ulp, Mosaic-lowerable: same range reduction as
    utils/accmath.exp_accurate but the 2^k scaling is jnp.exp2 of the
    integer-valued float k (exact power of two) instead of jnp.ldexp
    (whose jax lowering does not compile in Mosaic)."""
    k = jnp.round(y * _INV_LN2)
    r = y - k * _LN2_HI
    r = r - k * _LN2_LO
    p = 1.0 / 5040.0
    p = p * r + 1.0 / 720.0
    p = p * r + 1.0 / 120.0
    p = p * r + 1.0 / 24.0
    p = p * r + 1.0 / 6.0
    p = p * r + 0.5
    p = p * r + 1.0
    p = p * r + 1.0
    return p * jnp.exp2(k)


def _erfc_rows(y):
    """f32 erfc for y >= 0, Mosaic-lowerable (jax.scipy.special.erfc does
    not lower in Pallas TPU): the Cody rational regions of utils/ds.erfc in
    plain f32 with the exp2-based gaussian. Max relative error ~1e-6 — the
    same class as the XLA erfc the regular path uses (see
    ops/realspace.ewald_screening_s docstring)."""
    from admp_tpu.utils.ds import (
        _ERF_A, _ERF_B, _ERF_C, _ERF_D, _ERF_P, _ERF_Q,
    )

    ysq = y * y
    # region 1: y < 0.46875 — erfc = 1 - y P(y^2)/Q(y^2) (no cancellation
    # concern: erfc ~ 1 here, absolute error is relative error)
    z = ysq
    xnum = float(_ERF_A[4]) * z
    xden = z
    for i in range(3):
        xnum = (xnum + float(_ERF_A[i])) * z
        xden = (xden + float(_ERF_B[i])) * z
    r1 = 1.0 - y * (xnum + float(_ERF_A[3])) / (xden + float(_ERF_B[3]))

    exp_m = _exp_rows(-ysq)

    # region 2: 0.46875 <= y < 4 — erfc = exp(-y^2) P(y)/Q(y)
    y_s = jnp.where(y >= 0.46875, y, jnp.ones_like(y))
    xnum = float(_ERF_C[8]) * y_s
    xden = y_s
    for i in range(7):
        xnum = (xnum + float(_ERF_C[i])) * y_s
        xden = (xden + float(_ERF_D[i])) * y_s
    r2 = exp_m * (xnum + float(_ERF_C[7])) / (xden + float(_ERF_D[7]))

    # region 3: y >= 4 — erfc = exp(-y^2)/y (1/sqrt(pi) - z P(z)/Q(z)),
    # z = 1/y^2 (exp(-16) ~ 1e-7: rarely reached at Ewald kr but kept exact)
    big = y >= 4.0
    z3 = 1.0 / jnp.where(big, ysq, jnp.ones_like(ysq))
    xnum = float(_ERF_P[5]) * z3
    xden = z3
    for i in range(4):
        xnum = (xnum + float(_ERF_P[i])) * z3
        xden = (xden + float(_ERF_Q[i])) * z3
    r3 = z3 * (xnum + float(_ERF_P[4])) / (xden + float(_ERF_Q[4]))
    r3 = (1.0 / SQRT_PI) - r3
    erfc3 = exp_m * r3 / jnp.where(big, y, jnp.ones_like(y))

    return jnp.where(y < 0.46875, r1, jnp.where(big, erfc3, r2))


def table_width(lmax: int, lpol: bool = False) -> int:
    """Columns of the packed per-atom table: positions + harmonics
    (+ induced dipole, polarizability, thole width when polarizable)."""
    return 3 + (lmax + 1) ** 2 + (5 if lpol else 0)


def _wrap_rows(gi_t, gj_t, scal, mask):
    """Minimum-image wrap on row TUPLES — same math as
    realspace._displacement_from_rows, box/binv as scalars.

    ``gi_t``/``gj_t`` are tuples of (1, BC) rows (NOT stacked arrays):
    tuple indexing keeps slice/pad primitives out of the differentiated
    region — JAX's pad transpose emits NEGATIVE pads (crops) at second
    order, which Mosaic cannot lower (the exact-adjoint SCF field takes
    jax.vjp of a graph containing the bwd kernel, so kernel bodies must
    be Mosaic-lowerable at arbitrary AD order)."""
    box = scal[1:10]
    binv = scal[10:19]
    dx = gi_t[0] - gj_t[0]
    dy = gi_t[1] - gj_t[1]
    dz = gi_t[2] - gj_t[2]
    sa = dx * binv[0] + dy * binv[3] + dz * binv[6]
    sb = dx * binv[1] + dy * binv[4] + dz * binv[7]
    sc = dx * binv[2] + dy * binv[5] + dz * binv[8]
    sa = sa - jnp.floor(sa + 0.5)
    sb = sb - jnp.floor(sb + 0.5)
    sc = sc - jnp.floor(sc + 0.5)
    dx = sa * box[0] + sb * box[3] + sc * box[6]
    dy = sa * box[1] + sb * box[4] + sc * box[7]
    dz = sa * box[2] + sb * box[5] + sc * box[8]
    sq = dx * dx + dy * dy + dz * dz
    sq_safe = jnp.where(mask, sq, jnp.ones_like(sq))
    r = jnp.where(mask, jnp.sqrt(sq_safe), jnp.ones_like(sq))
    return dx, dy, dz, r, 1.0 / r


def _block_uu_energy(gi_t, gj_t, scl, scal):
    """Induced-induced (udud) pair energy — the SCF matvec's real-space
    slice (same math as models/pme.pme_real_uu_energy: radial projection,
    no QI frame). Table rows: [x, y, z, u_harm(3), pol, thole]; scl rows:
    [pscale, mask]."""
    pscale = scl[0]
    mask = scl[1] > 0.5
    kappa = scal[0]
    dx, dy, dz, r, rinv = _wrap_rows(gi_t, gj_t, scal, mask)
    # u in harmonic (z, x, y) order -> cartesian
    uiz, uix, uiy = gi_t[3], gi_t[4], gi_t[5]
    ujz, ujx, ujy = gj_t[3], gj_t[4], gj_t[5]
    ui_z = (uix * dx + uiy * dy + uiz * dz) * rinv
    uj_z = (ujx * dx + ujy * dy + ujz * dz) * rinv
    ui_dot_uj = uix * ujx + uiy * ujy + uiz * ujz
    dmp = realspace.pair_damping_width(gi_t[6], gj_t[6])
    m0, m1 = realspace.induced_uu_coefficients(
        r, gi_t[7], gj_t[7], dmp, pscale, kappa,
        erfc_fn=_erfc_rows, exp_fn=_exp_rows,
    )
    e = (m0 - m1) * uj_z * ui_z + m1 * ui_dot_uj
    return jnp.where(mask, e, jnp.zeros_like(e))


def _block_energy(gi_t, gj_t, scl, scal, lmax: int, lpol: bool = False):
    """Per-pair permanent energy from TRANSPOSED table blocks — the single
    block function the forward kernel, the in-kernel vjp, and the CPU/XLA
    cross-checks all trace.

    gi_t/gj_t: length-F TUPLES of (1, BC) transposed gathered rows
    [x, y, z, q_harm...] plus, when ``lpol``, [u_harm (3), pol, thole]
    (tuples, not stacked arrays — see _wrap_rows for the Mosaic AD-order
    rationale).
    scl: tuple of (1, BC) rows — row 0 mscale, row 1 mask (0/1); row 2
    pscale when ``lpol``.
    scal: tuple of _N_SCAL scalars — kappa, box.reshape(9),
    inv3x3(box).reshape(9) (a tuple, not an array: SMEM only supports
    scalar loads, and tuple inputs keep jax.grad per-scalar in the bwd
    kernel).
    Returns (1, BC) masked pair energies.
    """
    n_h = (lmax + 1) ** 2
    mscale = scl[0]
    mask = scl[1] > 0.5
    kappa = scal[0]
    box = scal[1:10]
    binv = scal[10:19]

    # minimum-image wrap — same math as realspace._displacement_from_rows,
    # box/binv as scalars
    dx = gi_t[0] - gj_t[0]
    dy = gi_t[1] - gj_t[1]
    dz = gi_t[2] - gj_t[2]
    sa = dx * binv[0] + dy * binv[3] + dz * binv[6]
    sb = dx * binv[1] + dy * binv[4] + dz * binv[7]
    sc = dx * binv[2] + dy * binv[5] + dz * binv[8]
    sa = sa - jnp.floor(sa + 0.5)
    sb = sb - jnp.floor(sb + 0.5)
    sc = sc - jnp.floor(sc + 0.5)
    dx = sa * box[0] + sb * box[3] + sc * box[6]
    dy = sa * box[1] + sb * box[4] + sc * box[7]
    dz = sa * box[2] + sb * box[5] + sc * box[8]
    sq = dx * dx + dy * dy + dz * dz
    sq_safe = jnp.where(mask, sq, jnp.ones_like(sq))
    r = jnp.where(mask, jnp.sqrt(sq_safe), jnp.ones_like(sq))
    rinv = 1.0 / r

    # quasi-internal frame (same math as ops/realspace.qi_pair_components);
    # the degeneracy seed uses RAW y/z coordinates, as there
    degenerate = jnp.logical_and(
        gi_t[1] == gj_t[1], gi_t[2] == gj_t[2]
    )
    fzx, fzy, fzz = dx * rinv, dy * rinv, dz * rinv
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
    nsq = vx * vx + vy * vy + vz * vz
    small = nsq < 1e-12
    ninv = jnp.where(
        small, 0.0, 1.0 / jnp.sqrt(jnp.where(small, 1.0, nsq))
    )
    fxx, fxy, fxz = vx * ninv, vy * ninv, vz * ninv
    fyx = fzy * fxz - fzz * fxy
    fyy = fzz * fxx - fzx * fxz
    fyz = fzx * fxy - fzy * fxx
    frame = (fxx, fxy, fxz, fyx, fyy, fyz, fzx, fzy, fzz)

    q_i = tuple(gi_t[3 + k] for k in range(n_h))
    q_j = tuple(gj_t[3 + k] for k in range(n_h))
    qi_i = rotate_harm_components(q_i, frame, lmax)
    qi_j = rotate_harm_components(q_j, frame, lmax)

    kr = kappa * r
    x = 2.0 * _exp_rows(-(kr * kr)) / SQRT_PI
    coef = realspace.perm_coefficients_from_screening(
        r, kr, x, mscale, lmax, erfc_fn=_erfc_rows
    )
    e = realspace.pair_energy_perm(qi_i, qi_j, coef, lmax)

    if lpol:
        pscale = scl[2]
        base = 3 + n_h
        zero = jnp.zeros_like(r)
        ui = rotate_harm_components(
            (zero, gi_t[base], gi_t[base + 1], gi_t[base + 2]), frame, 1
        )[1:]
        uj = rotate_harm_components(
            (zero, gj_t[base], gj_t[base + 1], gj_t[base + 2]), frame, 1
        )[1:]
        dmp = realspace.pair_damping_width(gi_t[base + 3], gj_t[base + 3])
        icoef = realspace.induced_coefficients(
            r, gi_t[base + 4], gj_t[base + 4], dmp,
            pscale, kappa, lmax, erfc_fn=_erfc_rows, exp_fn=_exp_rows,
        )
        e = e + realspace.pair_energy_induced(qi_i, qi_j, ui, uj, icoef,
                                              lmax)

    return jnp.where(mask, e, jnp.zeros_like(e))


def _block_dispatch(kind: str, lmax: int):
    if kind == "uu":
        return lambda gi_t, gj_t, scl, scal: _block_uu_energy(
            gi_t, gj_t, scl, scal
        )
    return lambda gi_t, gj_t, scl, scal: _block_energy(
        gi_t, gj_t, scl, scal, lmax, kind == "pol"
    )


def _unstack_rows(x, n):
    """(BC, F) VMEM block -> length-n tuple of (1, BC) rows (transpose +
    unit-row slices, in the PRIMAL only). Differentiated kernel regions
    take and return ROW TUPLES so their AD graphs contain no slice/pad
    primitives — JAX's pad transpose emits negative pads at second order,
    which Mosaic cannot lower."""
    x_t = jnp.transpose(x)
    return tuple(x_t[k:k + 1] for k in range(n))


def _restack_rows(rows):
    """Inverse of _unstack_rows: tuple of (1, BC) -> (BC, F)."""
    return jnp.transpose(jnp.concatenate(rows, axis=0))


def _make_fwd_kernel(lmax: int, f_cols: int, kind: str):
    block_fn = _block_dispatch(kind, lmax)

    def kernel(scal_ref, gi_ref, gj_ref, scl_ref, e_ref):
        gi_t = _unstack_rows(gi_ref[...], f_cols)
        gj_t = _unstack_rows(gj_ref[...], f_cols)
        scl = tuple(scl_ref[k:k + 1] for k in range(scl_ref.shape[0]))
        scal = tuple(scal_ref[k] for k in range(_N_SCAL))
        e_ref[...] = block_fn(gi_t, gj_t, scl, scal)

    return kernel


def _make_bwd_kernel(lmax: int, f_cols: int, kind: str):
    block_fn = _block_dispatch(kind, lmax)

    def kernel(scal_ref, gi_ref, gj_ref, scl_ref, ct_ref,
               dgi_ref, dgj_ref, dscl_ref, dscal_ref):
        ct = ct_ref[...]
        n_scl = scl_ref.shape[0]

        def f(gi_t, gj_t, scl, scal):
            return jnp.sum(block_fn(gi_t, gj_t, scl, scal) * ct)

        scal = tuple(scal_ref[k] for k in range(_N_SCAL))
        gi_t = _unstack_rows(gi_ref[...], f_cols)
        gj_t = _unstack_rows(gj_ref[...], f_cols)
        scl = tuple(scl_ref[k:k + 1] for k in range(n_scl))
        dgi, dgj, dscl, dscal = jax.grad(f, argnums=(0, 1, 2, 3))(
            gi_t, gj_t, scl, scal
        )
        dgi_ref[...] = _restack_rows(dgi)
        dgj_ref[...] = _restack_rows(dgj)
        dscl_ref[...] = jnp.concatenate(dscl, axis=0)
        # whole-array SMEM output: each program owns its row
        p = pl.program_id(0)
        for k in range(_N_SCAL):
            dscal_ref[p, k] = dscal[k]

    return kernel


def _pad_lanes(x, block):
    c = x.shape[-1] if x.ndim == 1 else x.shape[0]
    if x.ndim == 2:  # (C, F) tables: pad the PAIR axis (rows)
        pad = (-x.shape[0]) % block
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        return x
    raise AssertionError


def _pad_scl(scl, block):
    pad = (-scl.shape[1]) % block
    if pad:
        scl = jnp.pad(scl, ((0, 0), (0, pad)))
    if scl.shape[0] < 8:
        scl = jnp.pad(scl, ((0, 8 - scl.shape[0]), (0, 0)))
    return scl


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def pair_perm_energies(g_i, g_j, scl, scal, lmax, block=1024,
                       interpret=False, kind="perm"):
    """Per-pair permanent real-space energies via the fused pair kernel.

    g_i/g_j: (C, F) gathered per-pair rows of the packed atom table
    [x, y, z, q_harm...] + [u_harm(3), pol, thole] when ``lpol``
    (F = table_width(lmax, lpol)); kind='uu' instead takes the matvec
    table [x, y, z, u_harm(3), pol, thole] with scl [pscale, mask]; scal: (_N_SCAL,) [kappa, box(9), inv3x3(box)(9)]. Returns
    (C,) masked per-pair energies — identical physics to the XLA path
    (tests/test_pairs_kernel.py pins energies and every gradient).

    First-order differentiable (the custom-vjp backward is itself a Pallas
    kernel with no autodiff rule): callers that differentiate the GRADIENT
    graph again — the implicit-SCF exact adjoint takes jax.vjp of the field
    function — must use the XLA path for that function (see
    models/pme.py:_build_polarizable)."""
    c = g_i.shape[0]
    f_cols = g_i.shape[1]
    gi_p = _pad_lanes(g_i, block)
    gj_p = _pad_lanes(g_j, block)
    scl_p = _pad_scl(scl, block)
    c_pad = gi_p.shape[0]
    n_prog = c_pad // block
    scal_p = jnp.pad(scal.astype(g_i.dtype), (0, (-_N_SCAL) % 8))

    e = pl.pallas_call(
        _make_fwd_kernel(lmax, f_cols, kind),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((scal_p.shape[0],), lambda p: (_I0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, f_cols), lambda p: (p, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, f_cols), lambda p: (p, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda p: (_I0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block), lambda p: (_I0, p),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((1, c_pad), g_i.dtype,
                             scal_p, gi_p, gj_p, scl_p),
        interpret=interpret,
    )(scal_p, gi_p, gj_p, scl_p)
    return e[0, :c]


def _pair_perm_fwd(g_i, g_j, scl, scal, lmax, block=1024, interpret=False,
                   kind="perm"):
    e = pair_perm_energies(g_i, g_j, scl, scal, lmax, block, interpret, kind)
    return e, (g_i, g_j, scl, scal)


def _make_hvp_kernel(lmax: int, f_cols: int, kind: str):
    """Backward-of-backward: VJP of the gradient op B(x, ct) = J_f(x)^T ct
    at cotangents c — d_x is the ct-weighted Hessian-vector product H[ct] c
    (in-kernel grad-of-grad) and d_ct = J_f(x) c (in-kernel jax.jvp). This
    is what makes the pair kernels differentiable to ARBITRARY order: the
    implicit-SCF exact adjoint takes jax.vjp of the field function, whose
    primal graph contains the bwd kernel (the same structure that forced
    the spread/gather pair to be mutual-adjoint custom_vjps)."""
    block_fn = _block_dispatch(kind, lmax)

    def kernel(scal_ref, cscal_ref, gi_ref, gj_ref, scl_ref, ct_ref,
               cgi_ref, cgj_ref, cscl_ref,
               dgi_ref, dgj_ref, dscl_ref, dct_ref, dscal_ref):
        scal = tuple(scal_ref[k] for k in range(_N_SCAL))
        cscal = tuple(cscal_ref[k] for k in range(_N_SCAL))
        n_scl = scl_ref.shape[0]
        gi = _unstack_rows(gi_ref[...], f_cols)
        gj = _unstack_rows(gj_ref[...], f_cols)
        scl = tuple(scl_ref[k:k + 1] for k in range(n_scl))
        ct = ct_ref[...]
        cgi = _unstack_rows(cgi_ref[...], f_cols)
        cgj = _unstack_rows(cgj_ref[...], f_cols)
        cscl = tuple(cscl_ref[k:k + 1] for k in range(n_scl))

        # d_ct = J_f(x) c (B is linear in ct with coefficient J_f)
        _, d_ct = jax.jvp(
            block_fn, (gi, gj, scl, scal), (cgi, cgj, cscl, cscal)
        )
        dct_ref[...] = d_ct

        # d_x = grad_x <grad_x sum(f ct), c>
        def h(gi_t, gj_t, scl_t, scal_t):
            g = jax.grad(
                lambda a, b, c_, d_: jnp.sum(block_fn(a, b, c_, d_) * ct),
                argnums=(0, 1, 2, 3),
            )(gi_t, gj_t, scl_t, scal_t)
            out = sum(jnp.sum(a * b) for a, b in zip(g[0], cgi))
            out = out + sum(jnp.sum(a * b) for a, b in zip(g[1], cgj))
            out = out + sum(jnp.sum(a * b) for a, b in zip(g[2], cscl))
            for k in range(_N_SCAL):
                out = out + g[3][k] * cscal[k]
            return out

        dgi, dgj, dscl, dscal = jax.grad(h, argnums=(0, 1, 2, 3))(
            gi, gj, scl, scal
        )
        dgi_ref[...] = _restack_rows(dgi)
        dgj_ref[...] = _restack_rows(dgj)
        dscl_ref[...] = jnp.concatenate(dscl, axis=0)
        p = pl.program_id(0)
        for k in range(_N_SCAL):
            dscal_ref[p, k] = dscal[k]

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _pair_bwd_op(g_i, g_j, scl, scal, ct, lmax, block, interpret, kind,
                 n_scl_rows):
    """First-order gradients of the pair energies: the custom-vjp backward
    of pair_perm_energies, itself wrapped as a custom_vjp so it can appear
    in graphs that get differentiated AGAIN (exact-adjoint field VJP)."""
    c = g_i.shape[0]
    f_cols = g_i.shape[1]
    gi_p = _pad_lanes(g_i, block)
    gj_p = _pad_lanes(g_j, block)
    scl_p = _pad_scl(scl, block)
    ct_p = jnp.pad(ct[None], ((0, 0), (0, (-c) % block)))
    c_pad = gi_p.shape[0]
    n_prog = c_pad // block
    scal_p = jnp.pad(scal.astype(g_i.dtype), (0, (-_N_SCAL) % 8))

    dgi, dgj, dscl, dscal = pl.pallas_call(
        _make_bwd_kernel(lmax, f_cols, kind),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((scal_p.shape[0],), lambda p: (_I0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, f_cols), lambda p: (p, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, f_cols), lambda p: (p, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda p: (_I0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda p: (_I0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, f_cols), lambda p: (p, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, f_cols), lambda p: (p, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda p: (_I0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_prog, _N_SCAL), lambda p: (_I0, _I0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            out_struct((c_pad, f_cols), g_i.dtype,
                       scal_p, gi_p, gj_p, scl_p, ct_p),
            out_struct((c_pad, f_cols), g_i.dtype,
                       scal_p, gi_p, gj_p, scl_p, ct_p),
            out_struct((8, c_pad), g_i.dtype,
                       scal_p, gi_p, gj_p, scl_p, ct_p),
            out_struct((n_prog, _N_SCAL), g_i.dtype,
                       scal_p, gi_p, gj_p, scl_p, ct_p),
        ],
        interpret=interpret,
    )(scal_p, gi_p, gj_p, scl_p, ct_p)
    return (
        dgi[:c],
        dgj[:c],
        dscl[:n_scl_rows, :c],
        jnp.sum(dscal, axis=0).astype(scal.dtype),
    )


def _pair_bwd_op_fwd(g_i, g_j, scl, scal, ct, lmax, block, interpret, kind,
                     n_scl_rows):
    out = _pair_bwd_op(g_i, g_j, scl, scal, ct, lmax, block, interpret,
                       kind, n_scl_rows)
    return out, (g_i, g_j, scl, scal, ct)


def _pair_bwd_op_bwd(lmax, block, interpret, kind, n_scl_rows, res, cts):
    g_i, g_j, scl, scal, ct = res
    c_gi, c_gj, c_scl, c_scal = cts
    c = g_i.shape[0]
    f_cols = g_i.shape[1]
    # the hvp kernel traces ~4x the forward's op count; halve the block to
    # stay inside the Mosaic scoped-vmem stack limit
    blk = max(block // 4, 128)
    gi_p = _pad_lanes(g_i, blk)
    gj_p = _pad_lanes(g_j, blk)
    scl_p = _pad_scl(scl, blk)
    ct_p = jnp.pad(ct[None], ((0, 0), (0, (-c) % blk)))
    cgi_p = _pad_lanes(c_gi, blk)
    cgj_p = _pad_lanes(c_gj, blk)
    cscl_p = _pad_scl(c_scl, blk)
    c_pad = gi_p.shape[0]
    n_prog = c_pad // blk
    dtype = g_i.dtype
    scal_p = jnp.pad(scal.astype(dtype), (0, (-_N_SCAL) % 8))
    cscal_p = jnp.pad(c_scal.astype(dtype), (0, (-_N_SCAL) % 8))

    vm = lambda shape: pl.BlockSpec(shape, (lambda p: (p, _I0))
                                    if shape[0] == blk else
                                    (lambda p: (_I0, p)),
                                    memory_space=pltpu.VMEM)
    dgi, dgj, dscl, dct, dscal = pl.pallas_call(
        _make_hvp_kernel(lmax, f_cols, kind),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((scal_p.shape[0],), lambda p: (_I0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cscal_p.shape[0],), lambda p: (_I0,),
                         memory_space=pltpu.SMEM),
            vm((blk, f_cols)),
            vm((blk, f_cols)),
            vm((8, blk)),
            vm((1, blk)),
            vm((blk, f_cols)),
            vm((blk, f_cols)),
            vm((8, blk)),
        ],
        out_specs=[
            vm((blk, f_cols)),
            vm((blk, f_cols)),
            vm((8, blk)),
            vm((1, blk)),
            pl.BlockSpec((n_prog, _N_SCAL), lambda p: (_I0, _I0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            out_struct((c_pad, f_cols), dtype, gi_p, gj_p, scl_p, ct_p,
                       cgi_p, cgj_p, cscl_p, scal_p, cscal_p),
            out_struct((c_pad, f_cols), dtype, gi_p, gj_p, scl_p, ct_p,
                       cgi_p, cgj_p, cscl_p, scal_p, cscal_p),
            out_struct((8, c_pad), dtype, gi_p, gj_p, scl_p, ct_p,
                       cgi_p, cgj_p, cscl_p, scal_p, cscal_p),
            out_struct((1, c_pad), dtype, gi_p, gj_p, scl_p, ct_p,
                       cgi_p, cgj_p, cscl_p, scal_p, cscal_p),
            out_struct((n_prog, _N_SCAL), dtype, gi_p, gj_p, scl_p, ct_p,
                       cgi_p, cgj_p, cscl_p, scal_p, cscal_p),
        ],
        interpret=interpret,
    )(scal_p, cscal_p, gi_p, gj_p, scl_p, ct_p, cgi_p, cgj_p, cscl_p)
    return (
        dgi[:c],
        dgj[:c],
        dscl[:scl.shape[0], :c],
        jnp.sum(dscal, axis=0).astype(scal.dtype),
        dct[0, :c],
    )


_pair_bwd_op.defvjp(_pair_bwd_op_fwd, _pair_bwd_op_bwd)


def _pair_perm_bwd(lmax, block, interpret, kind, res, ct):
    g_i, g_j, scl, scal = res
    return _pair_bwd_op(
        g_i, g_j, scl, scal, ct, lmax, block, interpret, kind, scl.shape[0]
    )


pair_perm_energies.defvjp(_pair_perm_fwd, _pair_perm_bwd)
