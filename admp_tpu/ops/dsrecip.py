"""Double-single (two-float32) reciprocal PME: the <1e-6 accuracy engine.

Round-2 attribution (ROADMAP.md) pinned the TPU f32 force-error floor at
1.37e-6 on the hardware FFT's internal rounding, and the only mode below 1e-6
was 'f64-dft' — explicit matmul DFTs inside the software-emulated-f64 pipeline
at 509 ms/step (25x the f32 step). This module rebuilds the reciprocal path in
hand-rolled double-single arithmetic (utils/ds.py) that stays on the native
f32 vector units:

* DS B-spline weight pipeline (the piece polynomials of ops/bsplines.py with
  DS-split coefficients) — kills the 3.6e-4 weight-rounding term.
* exact fixed-point two-pass f32 scatter for the mesh accumulation (no
  float64 anywhere — the quantized pass is error-free by construction, the
  residual pass rounds at ~2^-26 of the mesh scale).
* DS radix-2 complex FFT ("compensated butterflies"): exact-split twiddle
  constants, DS complex arithmetic — no hardware-FFT rounding anywhere.
* DS influence convolution and pairwise-tree Parseval sum.
* A HAND-WRITTEN adjoint (custom_vjp): reverse-mode AD through error-free
  transformations silently degrades to plain f32 (in exact arithmetic every
  compensation term is identically zero, so AD differentiates the
  uncompensated graph — see utils/ds.py). The backward pass here evaluates
  the analytic force formulas in DS: potential mesh = 2 Re F(conj(w S)),
  stencil gathers, and the spline-derivative chain (one order higher than the
  forward channels, so third B-spline derivatives for quadrupole sources).

Scope: electrostatic PME (ck_1 influence, gamma excluded), order-6 splines,
lmax <= 2, power-of-two-factorable grids (radix-2 FFT; use
EngineConfig.fft_friendly_grid or an explicit K). Differentiable w.r.t.
positions and multipoles; the box is guarded (warn + zero tangent, as with
cache_influence). x64-free: runs in pure float32 pipelines.

Reference for the math being reproduced: admp/recip.py:21-431 (the spreading
pipeline and Parseval energy); the DS design is original to this engine.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from admp_tpu.ops import bsplines
from admp_tpu.utils import ds
from admp_tpu.utils.constants import DIELECTRIC

RT3 = 1.7320508075688772

# third-derivative piece table (forward needs up to 2nd; the hand adjoint
# differentiates each channel once more)
_C3 = bsplines._C2[:, 1:] * np.arange(1, bsplines.ORDER - 2)


def _ds_eval_pieces(u0, coeff_table):
    """DS evaluation of spline pieces: u0 DS (..., 3) -> DS (..., order, 3)."""
    order = coeff_table.shape[0]
    outs_hi, outs_lo = [], []
    consts = [
        [ds.from_f64(c) for c in coeff_table[k]] for k in range(order)
    ]
    for k in range(order):
        u = ds.add_f(u0, jnp.float32(k - order / 2.0))
        cs = consts[k]
        acc = ds._bc(cs[-1], u)
        for p in range(len(cs) - 2, -1, -1):
            acc = ds.add(ds.mul(acc, u), ds._bc(cs[p], u))
        outs_hi.append(acc[0])
        outs_lo.append(acc[1])
    return (jnp.stack(outs_hi, axis=-2), jnp.stack(outs_lo, axis=-2))


def ds_spline_tables(u0):
    """(B, B', B'', B''') at the 6 stencil offsets per dimension, all DS.

    Each entry: DS array (..., 6, 3)."""
    return (
        _ds_eval_pieces(u0, bsplines._C),
        _ds_eval_pieces(u0, bsplines._C1),
        _ds_eval_pieces(u0, bsplines._C2),
        _ds_eval_pieces(u0, _C3),
    )


# ---------------------------------------------------------------------------
# DS complex FFT (radix-2 DIT, recursion by even/odd split — fully vectorized
# over leading axes; twiddles are exact-split f64 constants)
# ---------------------------------------------------------------------------


def _twiddles(n):
    k = np.arange(n // 2)
    ang = -2.0 * np.pi * k / n
    return ds.from_f64(np.cos(ang)), ds.from_f64(np.sin(ang))


def _cmul(ar, ai, br, bi):
    rr = ds.sub(ds.mul(ar, br), ds.mul(ai, bi))
    ri = ds.add(ds.mul(ar, bi), ds.mul(ai, br))
    return rr, ri


def ds_fft_lead(re, im, n: int):
    """DS complex FFT along the LEADING axis (length n, power of two).

    Cooley-Tukey DIT by even/odd recursion; every split/concat runs on the
    major axis, so on TPU the minor (lane) dimension stays contiguous —
    last-axis strided slicing would shuffle lanes at every one of the log2(n)
    levels. Twiddles are exact-split f64 constants broadcast over the minor
    axes.
    """
    if n == 1:
        return re, im
    assert n % 2 == 0, "ds_fft_lead requires power-of-two lengths"
    er, ei = ds_fft_lead((re[0][0::2], re[1][0::2]),
                         (im[0][0::2], im[1][0::2]), n // 2)
    orr, oi = ds_fft_lead((re[0][1::2], re[1][1::2]),
                          (im[0][1::2], im[1][1::2]), n // 2)
    wr, wi = _twiddles(n)
    shape = (n // 2,) + (1,) * (er[0].ndim - 1)
    wr = (wr[0].reshape(shape), wr[1].reshape(shape))
    wi = (wi[0].reshape(shape), wi[1].reshape(shape))
    tr, ti = _cmul(orr, oi, wr, wi)
    top_r = ds.add(er, tr)
    top_i = ds.add(ei, ti)
    bot_r = ds.sub(er, tr)
    bot_i = ds.sub(ei, ti)
    return (
        (jnp.concatenate([top_r[0], bot_r[0]], axis=0),
         jnp.concatenate([top_r[1], bot_r[1]], axis=0)),
        (jnp.concatenate([top_i[0], bot_i[0]], axis=0),
         jnp.concatenate([top_i[1], bot_i[1]], axis=0)),
    )


def ds_fft_last(re, im, n: int):
    """DS complex FFT along the last axis (wrapper over the leading-axis
    kernel: one transpose in, one out)."""
    re_m = _move_lead(re, re[0].ndim - 1)
    im_m = _move_lead(im, im[0].ndim - 1)
    re_m, im_m = ds_fft_lead(re_m, im_m, n)
    back = lambda a: (jnp.moveaxis(a[0], 0, -1), jnp.moveaxis(a[1], 0, -1))
    return back(re_m), back(im_m)


def _move_lead(a, axis):
    return (jnp.moveaxis(a[0], axis, 0), jnp.moveaxis(a[1], axis, 0))


def _move_last(a, axis):
    return (jnp.moveaxis(a[0], axis, -1), jnp.moveaxis(a[1], axis, -1))


def _neg_index_map(x, axis):
    """x[(-k) % K] along ``axis``: flip then roll by one."""
    return jnp.roll(jnp.flip(x, axis), 1, axis)


def ds_rfft3(mesh):
    """DS real-input 3D FFT -> half spectrum (K1, K2, K3//2 + 1) complex DS.

    The z axis is transformed with the classic even/odd complex packing (one
    DS FFT of length K3/2 + an untangle), then axes 1 and 0 run the complex
    DS FFT on the K3h-column half arrays — ~2x the work of the full-spectrum
    ds_fft3 saved in the transform AND in everything downstream (influence
    multiply, Parseval sum).
    """
    k1, k2, k3 = mesh[0].shape
    m = k3 // 2
    # bring z to the FRONT once; every subsequent slice is major-axis
    tz = lambda x: jnp.transpose(x, (2, 0, 1))
    mz = (tz(mesh[0]), tz(mesh[1]))          # (K3, K1, K2)
    re = (mz[0][0::2], mz[1][0::2])          # pack z[2c] + i z[2c+1]
    im = (mz[0][1::2], mz[1][1::2])
    zr, zi = ds_fft_lead(re, im, m)
    # conj(Z_{-k mod m})
    zmr = (_neg_index_map(zr[0], 0), _neg_index_map(zr[1], 0))
    zmi = (_neg_index_map(zi[0], 0), _neg_index_map(zi[1], 0))
    er = ds.mul_pow2(ds.add(zr, zmr), 0.5)
    ei = ds.mul_pow2(ds.sub(zi, zmi), 0.5)
    orr = ds.mul_pow2(ds.add(zi, zmi), 0.5)
    oi = ds.mul_pow2(ds.neg(ds.sub(zr, zmr)), 0.5)
    ang = -2.0 * np.pi * np.arange(m) / k3
    wc = ds.from_f64(np.cos(ang))
    ws = ds.from_f64(np.sin(ang))
    shape = (m, 1, 1)
    wr = (wc[0].reshape(shape), wc[1].reshape(shape))
    wi = (ws[0].reshape(shape), ws[1].reshape(shape))
    tr, ti = _cmul(orr, oi, wr, wi)
    xr = ds.add(er, tr)
    xi = ds.add(ei, ti)
    # Nyquist mode: E and O are m-periodic -> X_{K3/2} = E_0 - O_0
    nyq_r = ds.sub((er[0][:1], er[1][:1]), (orr[0][:1], orr[1][:1]))
    nyq_i = ds.sub((ei[0][:1], ei[1][:1]), (oi[0][:1], oi[1][:1]))
    s_re = (jnp.concatenate([xr[0], nyq_r[0]], 0),
            jnp.concatenate([xr[1], nyq_r[1]], 0))
    s_im = (jnp.concatenate([xi[0], nyq_i[0]], 0),
            jnp.concatenate([xi[1], nyq_i[1]], 0))
    # now (K3h, K1, K2): FFT over K1 (axis 1) then K2 (axis 2)
    for axis in (1, 2):
        re_m = _move_lead(s_re, axis)
        im_m = _move_lead(s_im, axis)
        n = re_m[0].shape[0]
        re_m, im_m = ds_fft_lead(re_m, im_m, n)
        s_re = (jnp.moveaxis(re_m[0], 0, axis), jnp.moveaxis(re_m[1], 0, axis))
        s_im = (jnp.moveaxis(im_m[0], 0, axis), jnp.moveaxis(im_m[1], 0, axis))
    # back to (K1, K2, K3h)
    tb = lambda x: jnp.transpose(x, (1, 2, 0))
    return (tb(s_re[0]), tb(s_re[1])), (tb(s_im[0]), tb(s_im[1]))


def _hermitian_fill(s_re, s_im, k3: int):
    """Reconstruct the FULL z spectrum from the half one:
    X[k1, k2, j] = conj(X[(-k1) % K1, (-k2) % K2, K3 - j]) for j >= K3h."""
    k3h = k3 // 2 + 1

    def fill(x, sign):
        body = jnp.flip(x[:, :, 1:k3h - 1], 2)        # j = k3h .. K3-1
        body = _neg_index_map(_neg_index_map(body, 0), 1)
        return jnp.concatenate([x, sign * body], axis=2)

    re = (fill(s_re[0], 1.0), fill(s_re[1], 1.0))
    im = (fill(s_im[0], -1.0), fill(s_im[1], -1.0))
    return re, im


def ds_fft3(re, im):
    """DS complex 3D FFT of (K1, K2, K3) DS arrays (all power-of-two)."""
    for axis in (2, 1, 0):
        re_m = _move_lead(re, axis)
        im_m = _move_lead(im, axis)
        n = re_m[0].shape[0]
        re_m, im_m = ds_fft_lead(re_m, im_m, n)
        re = (jnp.moveaxis(re_m[0], 0, axis), jnp.moveaxis(re_m[1], 0, axis))
        im = (jnp.moveaxis(im_m[0], 0, axis), jnp.moveaxis(im_m[1], 0, axis))
    return re, im


def ds_irfft3(s_re, s_im):
    """Unnormalized inverse real 3D transform of a Hermitian HALF spectrum:
    x_n = sum_k X_k e^{+2πi k·n/K} over the full k grid, returned as the real
    (K1, K2, K3) DS mesh. Inverse counterpart of :func:`ds_rfft3`.

    Replaces the backward pass's hermitian_fill + full ds_fft3 (which
    transformed K3 z-columns through all three axes): axes 0/1 run on the
    K3/2+1 half columns and the z axis is one length-K3/2 complex transform
    plus the even/odd re-interleave — half the transform work."""
    k3h = s_re[0].shape[2]
    m = k3h - 1
    k3 = 2 * m
    # axes 0, 1: sum_k X e^{+2πi..} = conj(DFT(conj X)) — run the forward
    # kernel on the conjugate, conjugate the result
    for axis in (0, 1):
        re_m = _move_lead(s_re, axis)
        im_m = _move_lead(ds.neg(s_im), axis)
        n = re_m[0].shape[0]
        re_m, im_m = ds_fft_lead(re_m, im_m, n)
        s_re = (jnp.moveaxis(re_m[0], 0, axis), jnp.moveaxis(re_m[1], 0, axis))
        s_im = (jnp.moveaxis(-im_m[0], 0, axis),
                jnp.moveaxis(-im_m[1], 0, axis))
    # z untangle (inverse of ds_rfft3's packing): with
    #   A_j = X_j + conj(X_{m-j}) = 2 E_j
    #   B_j = (X_j - conj(X_{m-j})) e^{+2πi j/K3} = 2 O_j        (j = 0..m-1)
    # the even/odd samples interleave as
    #   x_{2t} + i x_{2t+1} = sum_j (A_j + i B_j) e^{+2πi jt/m}.
    tz = lambda x: jnp.transpose(x, (2, 0, 1))       # (K3h, K1, K2)
    xr = (tz(s_re[0]), tz(s_re[1]))
    xi = (tz(s_im[0]), tz(s_im[1]))
    head = lambda a: (a[0][:m], a[1][:m])            # j = 0..m-1
    xjr, xji = head(xr), head(xi)
    # conj(X_{m-j}), j = 0..m-1  (plain reversed slice — indices m-j run m..1,
    # all within the stored half spectrum; no modular wrap needed)
    rev = lambda a: (a[0][1:][::-1], a[1][1:][::-1])
    xmr, xmi_ = rev(xr), rev(xi)
    cr, ci = xmr, ds.neg(xmi_)
    ar = ds.add(xjr, cr)
    ai = ds.add(xji, ci)
    dr = ds.sub(xjr, cr)
    di = ds.sub(xji, ci)
    ang = 2.0 * np.pi * np.arange(m) / k3            # +w: conj of rfft's
    wc = ds.from_f64(np.cos(ang))
    ws = ds.from_f64(np.sin(ang))
    shape = (m, 1, 1)
    wr = (wc[0].reshape(shape), wc[1].reshape(shape))
    wi = (ws[0].reshape(shape), ws[1].reshape(shape))
    br, bi = _cmul(dr, di, wr, wi)
    zr = ds.add(ar, ds.neg(bi))                      # Z = A + iB
    zi = ds.add(ai, br)
    # z_t = sum_j Z_j e^{+2πi jt/m} = conj(DFT(conj Z))
    zr, zi = ds_fft_lead(zr, ds.neg(zi), m)
    zi = ds.neg(zi)
    # interleave: x[2t] = Re z_t, x[2t+1] = Im z_t along the leading axis
    def mix(re_p, im_p):
        stacked = jnp.stack([re_p, im_p], axis=1)    # (m, 2, K1, K2)
        return stacked.reshape((k3,) + re_p.shape[1:])
    out = (mix(zr[0], zi[0]), mix(zr[1], zi[1]))
    tb = lambda x: jnp.transpose(x, (1, 2, 0))       # back to (K1, K2, K3)
    return (tb(out[0]), tb(out[1]))


# ---------------------------------------------------------------------------
# DS geometry / k-space
# ---------------------------------------------------------------------------


def _ds_inv3x3(b):
    """DS inverse of a 3x3 built from a DS matrix given as a nested tuple
    b[i][j] of DS scalars. Returns (inv as nested DS, det DS)."""
    def mul2(i1, j1, i2, j2):
        return ds.mul(b[i1][j1], b[i2][j2])

    def cof(i, j):
        i1, i2 = [x for x in range(3) if x != i]
        j1, j2 = [x for x in range(3) if x != j]
        return ds.sub(mul2(i1, j1, i2, j2), mul2(i1, j2, i2, j1))

    det = ds.add(
        ds.sub(ds.mul(b[0][0], cof(0, 0)), ds.mul(b[0][1], cof(0, 1))),
        ds.mul(b[0][2], cof(0, 2)),
    )
    inv = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            c = cof(j, i)
            if (i + j) % 2:
                c = ds.neg(c)
            inv[i][j] = ds.div(c, ds._bc(det, c))
    return inv, det


def _ds_box(box):
    """Split an f32 (3,3) box into a nested DS tuple (lo = 0: the f32 input
    IS the exact value being differentiated against)."""
    return [[ds.ds(box[i, j]) for j in range(3)] for i in range(3)]


def _euler_theta_sq_axis(k: int):
    """Per-axis Euler factor theta^2 as exact-split constants (numpy f64)."""
    f = np.arange(k)
    ang = 2.0 * np.pi * f / k
    theta = (bsplines.B6_KNOTS[2] + 2.0 * bsplines.B6_KNOTS[1] * np.cos(ang)
             + 2.0 * bsplines.B6_KNOTS[0] * np.cos(2.0 * ang))
    return theta


def _int_freqs(k: int):
    f = np.arange(k)
    return np.where(f <= (k - 1) // 2, f, f - k).astype(np.float64)


def _bcn(c, n):
    """Broadcast a scalar DS constant to shape (n,)."""
    return (jnp.broadcast_to(c[0], (n,)), jnp.broadcast_to(c[1], (n,)))


def _kspace_weights_ds(box, grid_shape, kappa, rfft: bool = False):
    """DS influence weight grid w(k) = C(k^2)/theta^2 (k = 0 excluded ->
    weight 0). C = ck_1 = 2 pi exp(-k^2/4 kappa^2)/(V k^2). With ``rfft`` the
    last axis covers only the K3//2+1 non-negative z modes (pair with the
    Hermitian multiplicity vector for Parseval sums)."""
    k1, k2, k3 = grid_shape
    binv, det = _ds_inv3x3(_ds_box(box))
    f1, f2 = _int_freqs(k1), _int_freqs(k2)
    f3 = (np.arange(k3 // 2 + 1, dtype=np.float64) if rfft
          else _int_freqs(k3))
    k3n = f3.shape[0]

    # kvec_c = 2 pi (f1 binv[0][c] + f2 binv[1][c] + f3 binv[2][c]);
    # integer frequencies are exact in f32
    ksq = None
    for c in range(3):
        t1 = ds.mul_f(_bcn(binv[0][c], k1), jnp.asarray(f1, jnp.float32))
        t2 = ds.mul_f(_bcn(binv[1][c], k2), jnp.asarray(f2, jnp.float32))
        t3 = ds.mul_f(_bcn(binv[2][c], k3n), jnp.asarray(f3, jnp.float32))
        kc = ds.add(
            ds.add((t1[0][:, None, None], t1[1][:, None, None]),
                   (t2[0][None, :, None], t2[1][None, :, None])),
            (t3[0][None, None, :], t3[1][None, None, :]),
        )
        kc2 = ds.mul(kc, kc)
        ksq = kc2 if ksq is None else ds.add(ksq, kc2)
    ksq = ds.mul(ksq, ds._bc(ds.from_f64(4.0 * np.pi ** 2), ksq))

    # theta^2: separable exact-constant product
    t1 = _euler_theta_sq_axis(k1)
    t2 = _euler_theta_sq_axis(k2)
    t3 = _euler_theta_sq_axis(k3)[:k3n]
    theta = np.einsum("i,j,k->ijk", t1, t2, t3)
    theta_sq = ds.from_f64((theta * theta).astype(np.float64))

    nonzero = ksq[0] > 0.0
    ksq_safe = (jnp.where(nonzero, ksq[0], 1.0), jnp.where(nonzero, ksq[1], 0.0))
    # exp(-ksq / (4 kappa^2)) with an exact-split constant factor
    inv4k = ds.from_f64(1.0 / (4.0 * float(kappa) ** 2))
    arg = ds.neg(ds.mul(ksq_safe, ds._bc(inv4k, ksq_safe)))
    e = ds.exp(arg)
    v_inv = ds.recip(det)
    c_k = ds.mul(ds.div(e, ksq_safe), ds._bc(v_inv, e))
    c_k = ds.mul(c_k, ds._bc(ds.from_f64(2.0 * np.pi), c_k))
    w = ds.div(c_k, theta_sq)
    w = (jnp.where(nonzero, w[0], 0.0), jnp.where(nonzero, w[1], 0.0))
    return w


def _ds_mixing_matrix(binv, grid_shape, lmax: int):
    """DS mirror of ops/reciprocal.spread_mixing_matrix: the (H, T) constant
    folding the Cartesian chain rule into the harmonic channels, as a nested
    list of DS scalars. dug[j][c] = N_j binv[c][j]."""
    k_arr = [float(k) for k in grid_shape]
    dug = [[ds.mul_f(binv[c][j], jnp.float32(k_arr[j])) for c in range(3)]
           for j in range(3)]
    zero = ds.ds(jnp.zeros(()))
    one = ds.ds(jnp.ones(()))
    n_h = (lmax + 1) ** 2
    cols = [[one] + [zero] * (n_h - 1)]
    if lmax >= 1:
        for j in range(3):
            col = [zero, ds.neg(dug[j][2]), ds.neg(dug[j][0]),
                   ds.neg(dug[j][1])]
            if lmax >= 2:
                col += [zero] * 5
            cols.append(col)
    if lmax >= 2:
        rt3 = ds.from_f64(RT3)
        for (j, l) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
            def beta(c, d):
                b = ds.mul(dug[j][c], dug[l][d])
                if j != l:
                    b = ds.add(b, ds.mul(dug[l][c], dug[j][d]))
                return b
            b00, b11, b22 = beta(0, 0), beta(1, 1), beta(2, 2)
            tr = ds.add(ds.add(b00, b11), b22)
            col = [zero, zero, zero, zero,
                   ds.mul_f(ds.sub(ds.mul_f(b22, jnp.float32(3.0)), tr),
                            jnp.float32(0.5)),
                   ds.mul(ds._bc(rt3, b00), beta(0, 2)),
                   ds.mul(ds._bc(rt3, b00), beta(1, 2)),
                   ds.mul_f(ds.mul(ds._bc(rt3, b00), ds.sub(b00, b11)),
                            jnp.float32(0.5)),
                   ds.mul(ds._bc(rt3, b00), beta(0, 1))]
            cols.append(col)
    # transpose to M[h][t]
    n_t = len(cols)
    return [[cols[t][h] for t in range(n_t)] for h in range(n_h)], n_t


# separable derivative multi-indices, identical order to
# ops/reciprocal._SEP_TERMS
_SEP = [(0, 0, 0),
        (1, 0, 0), (0, 1, 0), (0, 0, 1),
        (2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1), (0, 0, 2)]


def _ds_alpha(q_harm, mixing, n_t, lmax: int):
    """alpha[t] = sum_h q~_h M[h][t] as a list of DS (N,) arrays (q~ carries
    the MPID quadrupole 1/3)."""
    n_h = (lmax + 1) ** 2
    third = ds.from_f64(1.0 / 3.0)
    q_cols = []
    for h in range(n_h):
        qh = ds.ds(q_harm[:, h])
        if h >= 4:
            qh = ds.mul(qh, ds._bc(third, qh))
        q_cols.append(qh)
    alphas = []
    for t in range(n_t):
        acc = None
        for h in range(n_h):
            m = mixing[h][t]
            term = ds.mul(q_cols[h], ds._bc(m, q_cols[h]))
            acc = term if acc is None else ds.add(acc, term)
        alphas.append(acc)
    return alphas


def _ds_q_points(alphas, tabs, lmax: int):
    """Per-atom 6^3 stencil values: sum_t alpha_t B^(p) (x) B^(q) (x) B^(r).

    tabs: (B, B', B'') DS (N, 6, 3) tables. Returns DS (N, 6, 6, 6)."""
    n_t = len(alphas)
    acc = None
    for t in range(n_t):
        p, q, r = _SEP[t]
        x = (tabs[p][0][..., 0], tabs[p][1][..., 0])  # (N, 6)
        y = (tabs[q][0][..., 1], tabs[q][1][..., 1])
        z = (tabs[r][0][..., 2], tabs[r][1][..., 2])
        ax = ds.mul((alphas[t][0][:, None], alphas[t][1][:, None]), x)
        xy = ds.mul((ax[0][:, :, None], ax[1][:, :, None]),
                    (y[0][:, None, :], y[1][:, None, :]))
        xyz = ds.mul((xy[0][:, :, :, None], xy[1][:, :, :, None]),
                     (z[0][:, None, None, :], z[1][:, None, None, :]))
        acc = xyz if acc is None else ds.add(acc, xyz)
    return acc


def _flat_stencil(m_u0, grid_shape):
    k1, k2, k3 = grid_shape
    offs = jnp.arange(-3, 3, dtype=jnp.int32)
    i1 = jnp.mod(m_u0[:, 0:1] + offs[None], k1)
    i2 = jnp.mod(m_u0[:, 1:2] + offs[None], k2)
    i3 = jnp.mod(m_u0[:, 2:3] + offs[None], k3)
    return ((i1[:, :, None, None] * k2 + i2[:, None, :, None]) * k3
            + i3[:, None, None, :])


def _ds_mesh_coords(positions, box, grid_shape):
    """DS mesh coordinates: int32 base index m_u0 and DS fractional offsets u0
    (in [3, 4)), plus the DS box inverse for the chain rule."""
    k_arr = jnp.asarray(grid_shape, jnp.float32)
    binv, _det = _ds_inv3x3(_ds_box(box))
    pos = [ds.ds(positions[:, c]) for c in range(3)]
    m_u0 = []
    u0_hi, u0_lo = [], []
    for j in range(3):
        # r_j = N_j * sum_c x_c binv[c][j]
        acc = None
        for c in range(3):
            t = ds.mul(pos[c], ds._bc(binv[c][j], pos[c]))
            acc = t if acc is None else ds.add(acc, t)
        r = ds.mul_f(acc, k_arr[j])
        m = jnp.ceil(r[0]).astype(jnp.int32)
        u = ds.add_f(ds.sub((m.astype(jnp.float32), jnp.zeros_like(r[0])), r),
                     jnp.float32(3.0))
        m_u0.append(m)
        u0_hi.append(u[0])
        u0_lo.append(u[1])
    m_u0 = jnp.stack(m_u0, axis=-1)
    u0 = (jnp.stack(u0_hi, axis=-1), jnp.stack(u0_lo, axis=-1))
    return m_u0, u0, binv


# ---------------------------------------------------------------------------
# Forward energy + hand-written DS adjoint
# ---------------------------------------------------------------------------


@jax.custom_jvp
def _ds_box_guard(box):
    """The DS engine's influence grid and chain rule are built for gradients
    w.r.t. positions/multipoles only; a perturbed box emits a prominent
    warning and contributes a ZERO tangent (no silently-partial virial).
    Broad linearizations (the implicit-SCF adjoint linearizes every input and
    discards unused cotangents) pass through with the same semantics."""
    return box


@partial(_ds_box_guard.defjvp, symbolic_zeros=True)
def _ds_box_guard_jvp(primals, tangents):
    import warnings

    (box,) = primals
    (t,) = tangents
    if not isinstance(t, jax.custom_derivatives.SymbolicZero):
        warnings.warn(
            "recip_precision='ds' does not track box gradients: the engine "
            "contributes ZERO box gradient. Harmless unless you consume "
            "dE/dbox (virial/NPT) — then use the f64 reciprocal modes. (May "
            "fire from internal linearizations, e.g. the implicit-SCF "
            "adjoint, even for position-only forces.)",
            stacklevel=2,
        )
        t = jax.tree_util.tree_map(jnp.zeros_like, box)
    return box, t


def _x64():
    return jax.config.jax_enable_x64


def _fp_scatter_ds(flat, qp, size, grid_shape):
    """Exact-to-~2^-26 mesh accumulation with two plain f32 scatters.

    Fixed-point trick: quantize every stencil value to a power-of-two quantum
    u sized so that all quantized values AND their per-point sums are exactly
    representable in f32 (multiples of u below 2^24 u) — that scatter is
    error-free regardless of accumulation order. The residuals (|r| <= u/2)
    go through a second f32 scatter whose rounding is ~2^-26 relative to the
    mesh scale. No float64 anywhere (the earlier design used an
    emulated-f64 scatter, the engine's one x64-dependent op).
    """
    hi, lo = qp
    vmax = jnp.max(jnp.abs(hi))
    # quantum = 2^(ceil(log2(vmax)) + 14 - 23): 2^14 headroom covers the
    # per-point accumulation depth (order^3-deep worst case) with margin
    expo = jnp.ceil(jnp.log2(jnp.maximum(vmax, 1e-30))).astype(jnp.int32)
    u = jnp.ldexp(jnp.float32(1.0), expo - 9)
    q1 = jnp.round(hi / u) * u          # exact ops: u is a power of two
    r = (hi - q1) + lo                  # |hi - q1| <= u/2: subtraction exact
    zero = jnp.zeros((size,), jnp.float32)
    mesh1 = zero.at[flat].add(q1.reshape(-1)).reshape(grid_shape)
    mesh2 = zero.at[flat].add(r.reshape(-1)).reshape(grid_shape)
    return ds.two_sum(mesh1, mesh2)


def _fwd_pieces(positions, box, q_harm, kappa, grid_shape, lmax,
                w_cached=None):
    k1, k2, k3 = grid_shape
    m_u0, u0, binv = _ds_mesh_coords(positions, box, grid_shape)
    tabs4 = ds_spline_tables(u0)
    mixing, n_t = _ds_mixing_matrix(binv, grid_shape, lmax)
    alphas = _ds_alpha(q_harm, mixing, n_t, lmax)
    qp = _ds_q_points(alphas, tabs4[:3], lmax)
    flat = _flat_stencil(m_u0, grid_shape).reshape(-1)
    mesh_ds = _fp_scatter_ds(flat, qp, k1 * k2 * k3, grid_shape)
    s_re, s_im = ds_rfft3(mesh_ds)
    w = (w_cached if w_cached is not None
         else _kspace_weights_ds(box, grid_shape, kappa, rfft=True))
    return m_u0, tabs4, mixing, n_t, alphas, binv, s_re, s_im, w


def _hermitian_mult(k3: int):
    """Multiplicity of each rfft z mode in the full spectrum (1, 2, ..., 1)."""
    k3h = k3 // 2 + 1
    m = np.full((k3h,), 2.0, np.float32)
    m[0] = 1.0
    m[-1] = 1.0
    return jnp.asarray(m)


def _energy_from_spectrum(s_re, s_im, w, prefactor, k3: int):
    s_sq = ds.add(ds.mul(s_re, s_re), ds.mul(s_im, s_im))
    terms = ds.mul(w, s_sq)
    terms = ds.mul_f(terms, _hermitian_mult(k3)[None, None, :])
    e = ds.sum_pairs(terms)
    e = ds.mul(e, ds._bc(ds.from_f64(prefactor), e))
    return e


def make_ds_pme_recip(kappa, grid_shape, lmax: int,
                      prefactor: float = DIELECTRIC, static_box=None):
    """Build the DS reciprocal engine: (positions, box, q_harm) -> energy.

    Same contract as ops/reciprocal.make_pme_recip with ck_1/no-gamma
    (electrostatics); power-of-two grids only (radix-2 DS FFT). The energy is
    float64 under x64 (else float32); forces via the hand-written DS adjoint.

    ``static_box``: fixed-cell fast path — precompute the DS k-space weights
    grid at build time instead of every step (the engine already does not
    track box gradients, see _ds_box_guard, so caching loses nothing).
    """
    grid_shape = tuple(int(k) for k in grid_shape)
    for k in grid_shape:
        assert k & (k - 1) == 0, (
            f"recip_precision='ds' needs power-of-two grids, got {grid_shape};"
            " use fft_friendly power-of-two K (e.g. 128)"
        )
    kappa = float(kappa)
    lmax = int(lmax)
    prefactor = float(prefactor)
    w_cached = None
    if static_box is not None:
        w_cached = _kspace_weights_ds(
            jnp.asarray(static_box, jnp.float32), grid_shape, kappa, rfft=True
        )

    @jax.custom_vjp
    def energy(positions, box, q_harm):
        *_rest, s_re, s_im, w = _fwd_pieces(
            positions, box, q_harm, kappa, grid_shape, lmax, w_cached
        )
        e = _energy_from_spectrum(s_re, s_im, w, prefactor, grid_shape[2])
        if _x64():
            return e[0].astype(jnp.float64) + e[1].astype(jnp.float64)
        return e[0]

    def energy_fwd(positions, box, q_harm):
        m_u0, tabs4, mixing, n_t, alphas, binv, s_re, s_im, w = _fwd_pieces(
            positions, box, q_harm, kappa, grid_shape, lmax, w_cached
        )
        e = _energy_from_spectrum(s_re, s_im, w, prefactor, grid_shape[2])
        out = (e[0].astype(jnp.float64) + e[1].astype(jnp.float64)
               if _x64() else e[0])
        t_re = ds.mul(w, s_re)
        t_im = ds.mul(w, s_im)
        res = (m_u0, tabs4, mixing, alphas, binv, t_re, t_im, box)
        return out, res

    def energy_bwd(res, g):
        (m_u0, tabs4, mixing, alphas, binv, t_re, t_im, box) = res
        n = m_u0.shape[0]
        n_h = (lmax + 1) ** 2
        n_t = len(alphas)

        # potential mesh: dE/dmesh = 2 Re F(conj(w S)) = 2 sum_k (wS)_k e^{+..},
        # x DIELECTRIC. T = w S is Hermitian (w real-symmetric, S Hermitian),
        # so the half spectrum feeds the inverse-real transform directly —
        # no full-spectrum reconstruction, half the transform work
        p_re = ds_irfft3(t_re, t_im)
        pot = ds.mul_f(p_re, jnp.float32(2.0))
        pot = ds.mul(pot, ds._bc(ds.from_f64(prefactor), pot))

        from admp_tpu.ops.pallas.spread import (
            _row_gather_eligible,
            _row_gather_impl,
        )

        if _row_gather_eligible(grid_shape):
            # hi/lo as two channels of one row gather (contiguous mesh rows
            # ride at bandwidth; per-element gathers run ~60M elem/s —
            # examples/gatherrow_98k_tpu.out); DS grids are powers of two,
            # so K3 >= 128 is always lane-aligned
            both = _row_gather_impl(
                m_u0, jnp.stack([pot[0], pot[1]]), grid_shape, 6
            )
            pw_hi = both[:, 0].reshape(n, 6, 6, 6)
            pw_lo = both[:, 1].reshape(n, 6, 6, 6)
        else:
            flat = _flat_stencil(m_u0, grid_shape)
            pw_hi = pot[0].reshape(-1)[flat]
            pw_lo = pot[1].reshape(-1)[flat]
        potwin = (pw_hi, pw_lo)  # (N, 6, 6, 6)

        # separable partial contractions up to 3rd-derivative channels
        def axis_tab(d, axis):
            return (tabs4[d][0][..., axis], tabs4[d][1][..., axis])

        c1 = []  # [r] -> DS (N, 6, 6)
        for r in range(4):
            z = axis_tab(r, 2)
            acc = None
            for kk in range(6):
                term = ds.mul(
                    (potwin[0][..., kk], potwin[1][..., kk]),
                    (z[0][:, kk][:, None, None], z[1][:, kk][:, None, None]),
                )
                acc = term if acc is None else ds.add(acc, term)
            c1.append(acc)
        c2 = {}  # (q, r) -> DS (N, 6)
        for r in range(4):
            for q in range(4 - r):
                y = axis_tab(q, 1)
                acc = None
                for jj in range(6):
                    term = ds.mul(
                        (c1[r][0][:, :, jj], c1[r][1][:, :, jj]),
                        (y[0][:, jj][:, None], y[1][:, jj][:, None]),
                    )
                    acc = term if acc is None else ds.add(acc, term)
                c2[(q, r)] = acc
        gpqr = {}  # (p, q, r) -> DS (N,)
        for r in range(4):
            for q in range(4 - r):
                for p in range(4 - r - q):
                    x = axis_tab(p, 0)
                    acc = None
                    for ii in range(6):
                        term = ds.mul(
                            (c2[(q, r)][0][:, ii], c2[(q, r)][1][:, ii]),
                            (x[0][:, ii], x[1][:, ii]),
                        )
                        acc = term if acc is None else ds.add(acc, term)
                    gpqr[(p, q, r)] = acc

        # multipole cotangent: dE/dq~_h = sum_t M[h][t] g_{SEP t}; quads /3
        third = ds.from_f64(1.0 / 3.0)
        cot_q = []
        for h in range(n_h):
            acc = None
            for t in range(n_t):
                m = mixing[h][t]
                term = ds.mul(gpqr[_SEP[t]], ds._bc(m, gpqr[_SEP[t]]))
                acc = term if acc is None else ds.add(acc, term)
            if h >= 4:
                acc = ds.mul(acc, ds._bc(third, acc))
            cot_q.append(acc[0] + acc[1])
        cot_q_full = jnp.stack(cot_q, axis=-1)

        # position cotangent: dE/du0_j = sum_t alpha_t g_{SEP t + e_j};
        # du0_j/dx_c = -N_j binv[c][j]
        k_arr = [float(k) for k in grid_shape]
        de_du = []
        for j in range(3):
            e_j = [0, 0, 0]
            e_j[j] = 1
            acc = None
            for t in range(n_t):
                p, q, r = _SEP[t]
                key = (p + e_j[0], q + e_j[1], r + e_j[2])
                term = ds.mul(alphas[t], gpqr[key])
                acc = term if acc is None else ds.add(acc, term)
            de_du.append(acc)
        cot_x = []
        for c in range(3):
            acc = None
            for j in range(3):
                dug = ds.mul_f(binv[c][j], jnp.float32(k_arr[j]))
                term = ds.mul(de_du[j], ds._bc(dug, de_du[j]))
                acc = term if acc is None else ds.add(acc, term)
            cot_x.append(-(acc[0] + acc[1]))
        cot_x = jnp.stack(cot_x, axis=-1)

        g32 = jnp.asarray(g, jnp.float32)
        return cot_x * g32, jnp.zeros_like(box), cot_q_full * g32

    energy.defvjp(energy_fwd, energy_bwd)

    def ds_pme_recip(positions, box, q_harm):
        box = _ds_box_guard(box)
        return energy(
            positions.astype(jnp.float32), box.astype(jnp.float32),
            q_harm[:, : (lmax + 1) ** 2].astype(jnp.float32),
        )

    return ds_pme_recip
