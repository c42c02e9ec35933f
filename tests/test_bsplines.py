import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from admp_tpu.ops import bsplines


def _b6_reference(u):
    """Direct divided-difference cardinal B-spline of order 6 (numpy)."""
    from math import comb, factorial

    u = np.asarray(u, dtype=float)
    out = np.zeros_like(u)
    for j in range(7):
        term = (-1.0) ** j * comb(6, j) * np.clip(u - j, 0.0, None) ** 5
        out += term
    return out / factorial(5)


def test_piece_polynomials_match_divided_difference():
    rng = np.random.default_rng(0)
    u0 = rng.uniform(3.0, 4.0, (64, 3))
    vals = np.asarray(bsplines.spline_values(jnp.asarray(u0)))
    for k in range(6):
        npt.assert_allclose(vals[:, k, :], _b6_reference(u0 + k - 3), atol=1e-12)


def test_partition_of_unity():
    rng = np.random.default_rng(1)
    u0 = rng.uniform(3.0, 4.0, (128, 3))
    vals = np.asarray(bsplines.spline_values(jnp.asarray(u0)))
    npt.assert_allclose(vals.sum(axis=1), 1.0, atol=1e-12)


def test_derivative_consistency():
    u0 = jnp.asarray(np.random.default_rng(2).uniform(3.0, 4.0, (8, 3)))

    def val_k(u, k, d):
        return bsplines.spline_values(u)[..., k, d]

    for k in (0, 2, 5):
        g_auto = jax.grad(lambda u: jnp.sum(val_k(u, k, 1)))(u0)[..., 1]
        g_table = bsplines.spline_derivs(u0)[..., k, 1]
        npt.assert_allclose(np.asarray(g_auto), np.asarray(g_table), atol=1e-12)

    for k in (1, 3):
        h_auto = jax.grad(
            lambda u: jnp.sum(bsplines.spline_derivs(u)[..., k, 0])
        )(u0)[..., 0]
        h_table = bsplines.spline_derivs2(u0)[..., k, 0]
        npt.assert_allclose(np.asarray(h_auto), np.asarray(h_table), atol=1e-12)


def test_knot_values():
    # B6 at integer knots 1..5, used by the closed-form Euler factor
    vals = np.asarray(
        bsplines.spline_values(jnp.full((1, 3), 3.0))
    )[0, :, 0]
    # piece k evaluated at its left edge u = k equals B6(k); B6(0) = 0
    npt.assert_allclose(vals[0], 0.0, atol=1e-14)
    npt.assert_allclose(vals[1:], bsplines.B6_KNOTS, atol=1e-14)


def test_euler_spline_matches_direct_sum():
    n = 24
    k = jnp.arange(n, dtype=jnp.float64)
    direct = np.zeros(n)
    for m in (-2, -1, 0, 1, 2):
        direct += _b6_reference(np.array([m + 3.0]))[0] * np.cos(
            2 * np.pi * m * np.asarray(k) / n
        )
    npt.assert_allclose(
        np.asarray(bsplines.euler_spline_theta(k, n)), direct, atol=1e-12
    )


def test_exp_accurate_f32():
    from admp_tpu.utils.accmath import exp_accurate

    y = jnp.asarray(np.linspace(-30.0, 5.0, 200001), jnp.float32)
    got = np.asarray(exp_accurate(y), np.float64)
    ref = np.exp(np.asarray(y, np.float64))
    rel = np.abs(got - ref) / ref
    assert rel.max() < 3e-7
    # f64 passthrough stays exact
    y64 = jnp.asarray([-2.0, 0.0, 3.0], jnp.float64)
    np.testing.assert_allclose(
        np.asarray(exp_accurate(y64)), np.exp(np.asarray(y64)), rtol=1e-15
    )


def test_order4_spline_partition_of_unity():
    import numpy as np
    import jax.numpy as jnp

    from admp_tpu.ops.bsplines import spline_values4

    u0 = jnp.asarray(np.random.default_rng(0).uniform(2, 3, (500, 3)))
    v = spline_values4(u0)
    np.testing.assert_allclose(np.asarray(jnp.sum(v, axis=-2)), 1.0, atol=1e-12)


def test_order4_dispersion_spread_consistency():
    """Order-4 dispersion spreading reproduces the order-6 reciprocal energy
    within the measured interpolation band (CPU f64: ~2.6e-4 relative on
    water_1024; this smaller box gets a loose 1e-3 gate)."""
    import numpy as np
    import jax.numpy as jnp

    from admp_tpu.ops.influence import ck_6
    from admp_tpu.ops.reciprocal import make_disp_pme_recip
    from tests.watergen import water_arrays

    s = water_arrays(n_side=3, spacing=3.1, jitter=0.12, seed=11)
    pos = jnp.asarray(s["positions"])
    box = jnp.asarray(s["box"])
    c = jnp.asarray(
        np.abs(np.random.default_rng(2).standard_normal((pos.shape[0], 1)))
    )
    r6 = make_disp_pme_recip([ck_6], 0.7, (32, 32, 32))(pos, box, c)
    r4 = make_disp_pme_recip([ck_6], 0.7, (32, 32, 32), spread_order=4)(
        pos, box, c
    )
    assert abs(float(r4) - float(r6)) < 1e-3 * abs(float(r6)), (r4, r6)


def test_separable_spread_matches_direct_weights():
    """The separable-term spread (constant mixing matrix x separable spline
    products, ops/reciprocal.spread_points_separable) must reproduce the
    direct harmonic weight formulation (spread_weights, the readable spec)
    exactly for every lmax."""
    import numpy as np

    from admp_tpu.ops import reciprocal as R

    rng = np.random.default_rng(3)
    n = 57
    u0 = jnp.asarray(rng.uniform(3.0, 4.0, (n, 3)))
    dug = jnp.asarray(rng.normal(size=(3, 3)))
    for lmax in (0, 1, 2):
        q = jnp.asarray(rng.normal(size=(n, (lmax + 1) ** 2)))
        direct = jnp.einsum(
            "ah,aijkh->aijk", q, R.spread_weights(u0, dug, lmax)
        )
        alpha = q @ R.spread_mixing_matrix(dug, lmax)
        sep = R.spread_points_separable(u0, alpha, lmax)
        np.testing.assert_allclose(
            np.asarray(sep), np.asarray(direct), rtol=1e-13, atol=1e-13
        )
