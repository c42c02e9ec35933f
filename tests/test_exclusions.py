import jax.numpy as jnp
import numpy as np

from admp_tpu import ADMPPmeForce, convert_cart2harm, neighbor_list_dense
from admp_tpu.ops.exclusions import build_sparse_exclusions
from tests.watergen import water_arrays

M_SCALES = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])


def test_sparse_lookup_matches_dense():
    s = water_arrays(n_side=3, spacing=3.1, jitter=0.1, seed=11)
    n = s["positions"].shape[0]
    bonds = [(3 * m, 3 * m + 1) for m in range(n // 3)] + [
        (3 * m, 3 * m + 2) for m in range(n // 3)
    ]
    sparse = build_sparse_exclusions(bonds, n, max_depth=6)
    dense = jnp.asarray(s["covalent_map"])
    rng = np.random.default_rng(0)
    i = jnp.asarray(rng.integers(0, n, 500))
    j = jnp.asarray(rng.integers(0, n, 500))
    np.testing.assert_array_equal(
        np.asarray(sparse.lookup(i, j)), np.asarray(dense[i, j])
    )


def test_energy_identical_with_sparse_exclusions():
    s = water_arrays(n_side=3, spacing=3.1, jitter=0.1, seed=12)
    n = s["positions"].shape[0]
    bonds = [(3 * m, 3 * m + 1) for m in range(n // 3)] + [
        (3 * m, 3 * m + 2) for m in range(n // 3)
    ]
    sparse = build_sparse_exclusions(bonds, n, max_depth=6)
    nl = neighbor_list_dense(s["positions"], s["box"], 4.0)
    pairs = jnp.asarray(nl.pairs)
    pos = jnp.asarray(s["positions"])
    box = jnp.asarray(s["box"])
    ql = convert_cart2harm(jnp.asarray(s["q_cart"]), 2)

    energies = []
    for cov in (s["covalent_map"], sparse):
        force = ADMPPmeForce(
            box, s["axis_types"], s["axis_indices"], cov, 4.0, 1e-3, 2
        )
        energies.append(float(force.get_energy(pos, box, pairs, ql, M_SCALES)))
    assert energies[0] == energies[1]
