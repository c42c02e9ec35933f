"""Fused Pallas TPU kernel for the real-space pair pass (permanent terms).

Why: the pure-XLA SoA pair pipeline at 98k atoms / 1.6M pairs measures
~113 ms e+g while the packed gathers + their scatter transpose alone are
~19 ms and the arithmetic is < 1 GFLOP (examples/realsplit_98k_tpu.out,
realsplit2_98k_tpu.out) — the cost is XLA fusion/materialization of dozens
of (C,)-shaped intermediates in the forward AND the transposed backward, not
flops or the necessary HBM traffic (the bisect is non-monotonic: adding the
rotations measured FASTER than displacement-only). Fusing the whole per-pair
computation — QI frame, harmonic rotations, screened coefficients, bilinear
contraction (reference: admp/spatial.py:149-178 + admp/multipole.py:92-179 +
admp/pme.py:258-334,479-624) — into ONE Pallas program keeps every
intermediate in VMEM.

Design notes:
- Inputs ride TRANSPOSED, (rows, C): pair index on the lane axis (full VPU
  width per op); a (C, 24) layout would tile-pad the minor dim to 128 lanes
  (~5x bytes) and put per-pair quantities on the sublane axis.
- The gathers, the PBC wrap, and the exclusion lookup stay OUTSIDE in XLA:
  position/box/multipole cotangents then flow through XLA's own gather
  transpose, and the box gradient (virial) needs the wrap to be
  differentiable end-to-end.
- The backward kernel does NOT hand-differentiate anything: it calls
  jax.vjp on the same row function INSIDE the kernel body (trace-time
  autodiff of elementwise math lowers like any other Mosaic program), so the
  adjoint also lives entirely in VMEM. kappa's cotangent is accumulated
  per-program and reduced outside — no silently-zero gradients.
- Math is shared with the XLA path via ops/realspace (perm_coefficients,
  pair_energy_perm) and ops/harmonics (rotate_harm_components): one source
  of truth for the physics; only exp() is swapped for an exp2-based
  formulation (jnp.ldexp does not lower in Mosaic).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from admp_tpu.ops import realspace
from admp_tpu.ops.harmonics import rotate_harm_components
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


def n_diff_rows(lmax: int) -> int:
    """dx, dy, dz + q_i + q_j + mscale."""
    return 4 + 2 * (lmax + 1) ** 2


def _rows_pad(lmax: int) -> int:
    return -(-n_diff_rows(lmax) // 8) * 8


def pair_rows_energy(xd, aux, kappa, lmax: int):
    """Per-pair permanent energy from row-stacked inputs — the single source
    the forward kernel, the in-kernel vjp, and the CPU/XLA cross-checks all
    trace.

    xd:  (>=n_diff_rows, C) f32 — [dx, dy, dz, q_i(H), q_j(H), mscale]
         (dx/dy/dz already minimum-image wrapped).
    aux: (2, C) f32 — [mask, degenerate] as 0/1 indicators.
    kappa: scalar.
    Returns (1, C) masked pair energies.
    """
    n_h = (lmax + 1) ** 2
    dx = xd[0:1]
    dy = xd[1:2]
    dz = xd[2:3]
    q_i = tuple(xd[3 + k:4 + k] for k in range(n_h))
    q_j = tuple(xd[3 + n_h + k:4 + n_h + k] for k in range(n_h))
    mscale = xd[3 + 2 * n_h:4 + 2 * n_h]
    mask = aux[0:1] > 0.5
    degenerate = aux[1:2] > 0.5

    sq = dx * dx + dy * dy + dz * dz
    sq_safe = jnp.where(mask, sq, jnp.ones_like(sq))
    r = jnp.where(mask, jnp.sqrt(sq_safe), jnp.ones_like(sq))
    rinv = 1.0 / r

    # quasi-internal frame (same math as ops/realspace.qi_pair_components;
    # the degeneracy indicator is precomputed outside from raw coordinates)
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

    qi_i = rotate_harm_components(q_i, frame, lmax)
    qi_j = rotate_harm_components(q_j, frame, lmax)

    # screened coefficients: realspace.perm_coefficients with the gaussian
    # evaluated by the exp2 form (see _exp_rows)
    kr = kappa * r
    x = 2.0 * _exp_rows(-(kr * kr)) / SQRT_PI
    coef = realspace.perm_coefficients_from_screening(
        r, kr, x, mscale, lmax, erfc_fn=_erfc_rows
    )
    e = realspace.pair_energy_perm(qi_i, qi_j, coef, lmax)
    return jnp.where(mask, e, jnp.zeros_like(e))


def _make_fwd_kernel(lmax: int):
    def kernel(kappa_ref, xd_ref, aux_ref, e_ref):
        e_ref[...] = pair_rows_energy(
            xd_ref[...], aux_ref[...], kappa_ref[0], lmax
        )

    return kernel


def _make_bwd_kernel(lmax: int):
    def kernel(kappa_ref, xd_ref, aux_ref, ct_ref, gx_ref, gk_ref):
        xd = xd_ref[...]
        aux = aux_ref[...]
        ct = ct_ref[...]

        def f(x, kap):
            return jnp.sum(pair_rows_energy(x, aux, kap, lmax) * ct)

        gx, gk = jax.grad(f, argnums=(0, 1))(xd, kappa_ref[0])
        gx_ref[...] = gx
        # whole-array SMEM output: each program owns its row
        gk_ref[pl.program_id(0), 0] = gk

    return kernel


def _pad_pairs(x, block):
    c = x.shape[1]
    pad = (-c) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def pair_perm_energies(xd, aux, kappa, lmax, block=2048, interpret=False):
    """Per-pair permanent real-space energies via the fused Pallas kernel.

    xd (D, C) row-stacked differentiable inputs, aux (2, C) indicators
    (see pair_rows_energy). Returns (C,) masked per-pair energies —
    identical math to the XLA path (tests pin both to ~1 ulp)."""
    d_pad = _rows_pad(lmax)
    xd_p = _pad_pairs(jnp.pad(xd, ((0, d_pad - xd.shape[0]), (0, 0))), block)
    aux_p = _pad_pairs(aux, block)
    c_pad = xd_p.shape[1]
    n_prog = c_pad // block
    kap = jnp.reshape(kappa.astype(xd.dtype), (1,))

    e = pl.pallas_call(
        _make_fwd_kernel(lmax),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((1,), lambda p: (_I0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((d_pad, block), lambda p: (_I0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block), lambda p: (_I0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block), lambda p: (_I0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, c_pad), xd.dtype),
        interpret=interpret,
    )(kap, xd_p, aux_p)
    return e[0, : xd.shape[1]]


def _pair_perm_fwd(xd, aux, kappa, lmax, block=2048, interpret=False):
    e = pair_perm_energies(xd, aux, kappa, lmax, block, interpret)
    return e, (xd, aux, kappa)


def _pair_perm_bwd(lmax, block, interpret, res, ct):
    xd, aux, kappa = res
    d_rows = n_diff_rows(lmax)
    d_pad = _rows_pad(lmax)
    xd_p = _pad_pairs(jnp.pad(xd, ((0, d_pad - xd.shape[0]), (0, 0))), block)
    aux_p = _pad_pairs(aux, block)
    ct_p = _pad_pairs(ct[None], block)
    c_pad = xd_p.shape[1]
    n_prog = c_pad // block
    kap = jnp.reshape(kappa.astype(xd.dtype), (1,))

    gx, gk = pl.pallas_call(
        _make_bwd_kernel(lmax),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((1,), lambda p: (_I0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((d_pad, block), lambda p: (_I0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block), lambda p: (_I0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda p: (_I0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d_pad, block), lambda p: (_I0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_prog, 1), lambda p: (_I0, _I0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d_pad, c_pad), xd.dtype),
            jax.ShapeDtypeStruct((n_prog, 1), xd.dtype),
        ],
        interpret=interpret,
    )(kap, xd_p, aux_p, ct_p)
    g_xd = gx[: xd.shape[0], : xd.shape[1]]
    g_kappa = jnp.sum(gk).astype(kappa.dtype).reshape(jnp.shape(kappa))
    return g_xd, jnp.zeros_like(aux), g_kappa


pair_perm_energies.defvjp(_pair_perm_fwd, _pair_perm_bwd)
