"""Pallas spread kernel: interpret-mode equivalence with the XLA scatter path."""

import jax.numpy as jnp
import numpy as np
import pytest

from admp_tpu.ops.pallas.spread import pallas_spread_available, spread_to_mesh_pallas


@pytest.mark.parametrize("k,n,slabs", [(32, 300, 4), (24, 64, 3)])
def test_pallas_spread_matches_scatter(k, n, slabs):
    if not pallas_spread_available():
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(0)
    m_u0 = jnp.asarray(rng.integers(0, k, (n, 3)), jnp.int32)
    q = jnp.asarray(rng.normal(size=(n, 6, 6, 6)).astype(np.float32))

    off = jnp.arange(-3, 3)
    i1 = jnp.mod(m_u0[:, 0:1] + off[None], k)
    i2 = jnp.mod(m_u0[:, 1:2] + off[None], k)
    i3 = jnp.mod(m_u0[:, 2:3] + off[None], k)
    ref = (
        jnp.zeros((k, k, k), jnp.float32)
        .at[i1[:, :, None, None], i2[:, None, :, None], i3[:, None, None, :]]
        .add(q)
    )
    out = spread_to_mesh_pallas(m_u0, q, (k, k, k), n_slabs=slabs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
