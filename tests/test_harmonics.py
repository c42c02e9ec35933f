import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from admp_tpu.ops import harmonics


def _random_rotation(key):
    a = jax.random.normal(key, (3, 3))
    q, _ = jnp.linalg.qr(a)
    # ensure det +1
    q = q * jnp.sign(jnp.linalg.det(q))
    return q


def test_cart2harm_water_values():
    """Hand-computed conversion for the MPID water multipoles
    (values from examples/water_1024/mpidwater.xml after x10 / x300 scaling)."""
    theta_o = np.array(
        [-1.0614, 0.0, 0.0, -0.23671684,
         0.0452889, 0.026121, -0.0714102, 0.0, 0.0, 0.0]
    )
    q = harmonics.convert_cart2harm(jnp.asarray(theta_o)[None], 2)[0]
    npt.assert_allclose(q[0], -1.0614, rtol=1e-12)
    # dipole goes to (z, x, y)
    npt.assert_allclose(np.asarray(q[1:4]), [-0.23671684, 0.0, 0.0], atol=1e-12)
    # Q20 = qZZ, Q22c = (qXX - qYY)/sqrt(3)
    npt.assert_allclose(q[4], -0.0714102, rtol=1e-12)
    npt.assert_allclose(q[7], (0.0452889 - 0.026121) / np.sqrt(3), rtol=1e-9)
    npt.assert_allclose(np.asarray(q)[[5, 6, 8]], 0.0, atol=1e-15)


def test_cart_harm_roundtrip():
    key = jax.random.PRNGKey(0)
    theta = jax.random.normal(key, (16, 10))
    # make the quadrupole part traceless (physical multipoles are)
    trace = (theta[:, 4] + theta[:, 5] + theta[:, 6]) / 3.0
    theta = theta.at[:, 4:7].add(-trace[:, None])
    q = harmonics.convert_cart2harm(theta, 2)
    back = harmonics.convert_harm2cart(q, 2)
    npt.assert_allclose(np.asarray(back), np.asarray(theta), atol=1e-12)


def test_rotation_roundtrip_and_norm():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, (32, 9))
    frames = jnp.stack([_random_rotation(k) for k in jax.random.split(k2, 32)])
    q_loc = harmonics.rot_global2local(q, frames, 2)
    q_back = harmonics.rot_local2global(q_loc, frames, 2)
    npt.assert_allclose(np.asarray(q_back), np.asarray(q), atol=1e-10)
    # rotations preserve the per-l norms
    for sl in (slice(0, 1), slice(1, 4), slice(4, 9)):
        npt.assert_allclose(
            np.linalg.norm(np.asarray(q_loc[:, sl]), axis=1),
            np.linalg.norm(np.asarray(q[:, sl]), axis=1),
            rtol=1e-10,
        )


def test_rotation_composition():
    key = jax.random.PRNGKey(2)
    ka, kb, kq = jax.random.split(key, 3)
    ra = _random_rotation(ka)
    rb = _random_rotation(kb)
    q = jax.random.normal(kq, (5, 9))
    frames_a = jnp.broadcast_to(ra, (5, 3, 3))
    frames_b = jnp.broadcast_to(rb, (5, 3, 3))
    frames_ab = jnp.broadcast_to(rb @ ra, (5, 3, 3))
    one = harmonics.rot_global2local(
        harmonics.rot_global2local(q, frames_a, 2), frames_b, 2
    )
    two = harmonics.rot_global2local(q, frames_ab, 2)
    npt.assert_allclose(np.asarray(one), np.asarray(two), atol=1e-10)


def test_identity_rotation():
    q = jnp.arange(9.0)[None]
    frames = jnp.eye(3)[None]
    npt.assert_allclose(
        np.asarray(harmonics.rot_global2local(q, frames, 2)), np.asarray(q), atol=1e-14
    )


def test_dipole_rotation_consistency():
    """Bare-dipole rotation must agree with the l=1 block of the full rotation."""
    key = jax.random.PRNGKey(3)
    ku, kf = jax.random.split(key)
    u = jax.random.normal(ku, (8, 3))
    frames = jnp.stack([_random_rotation(k) for k in jax.random.split(kf, 8)])
    full = harmonics.rot_global2local(
        jnp.concatenate([jnp.zeros((8, 1)), u], axis=-1), frames, 1
    )[:, 1:4]
    bare = harmonics.rot_dipole_global2local(u, frames)
    npt.assert_allclose(np.asarray(bare), np.asarray(full), atol=1e-12)


def test_cart_dipole_helpers():
    u = jnp.asarray([[1.0, 2.0, 3.0]])
    h = harmonics.cart_dipole_to_harm(u)
    npt.assert_allclose(np.asarray(h), [[3.0, 1.0, 2.0]])
    npt.assert_allclose(np.asarray(harmonics.harm_dipole_to_cart(h)), np.asarray(u))
