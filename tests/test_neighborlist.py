import pytest
import jax.numpy as jnp
import numpy as np

from admp_tpu.ops.neighborlist import (
    neighbor_list_cell,
    neighbor_list_dense,
    update_neighbor_list,
)


def _brute_force_pairs(positions, box, cutoff):
    n = positions.shape[0]
    inv = np.linalg.inv(box)
    out = set()
    for i in range(n):
        for j in range(i + 1, n):
            ds = (positions[i] - positions[j]) @ inv
            ds -= np.floor(ds + 0.5)
            if np.linalg.norm(ds @ box) < cutoff:
                out.add((i, j))
    return out


def _as_set(nlist, n):
    pairs = np.asarray(nlist.pairs)
    real = pairs[pairs[:, 0] < n]
    return {tuple(p) for p in real}


def test_dense_matches_brute_force():
    rng = np.random.default_rng(0)
    box = np.eye(3) * 12.0
    positions = rng.uniform(0, 12.0, (80, 3))
    want = _brute_force_pairs(positions, box, 3.0)
    nlist = neighbor_list_dense(positions, box, 3.0)
    assert _as_set(nlist, 80) == want
    assert not bool(nlist.did_overflow)


@pytest.mark.slow
def test_cell_matches_dense():
    rng = np.random.default_rng(1)
    box = np.eye(3) * 25.0
    positions = rng.uniform(0, 25.0, (400, 3))
    dense = neighbor_list_dense(positions, box, 4.0)
    cell = neighbor_list_cell(positions, box, 4.0)
    assert _as_set(cell, 400) == _as_set(dense, 400)
    assert not bool(cell.did_overflow)


def test_update_is_fixed_shape():
    rng = np.random.default_rng(2)
    box = np.eye(3) * 12.0
    positions = rng.uniform(0, 12.0, (60, 3))
    nlist = neighbor_list_dense(positions, box, 3.0)
    moved = positions + rng.normal(0, 0.05, positions.shape)
    updated = update_neighbor_list(nlist, jnp.asarray(moved), jnp.asarray(box))
    assert updated.pairs.shape == nlist.pairs.shape
    assert _as_set(updated, 60) == _brute_force_pairs(moved, box, 3.0)


def test_positions_outside_primary_cell():
    rng = np.random.default_rng(3)
    box = np.eye(3) * 12.0
    positions = rng.uniform(0, 12.0, (50, 3))
    shifted = positions + np.array([24.0, -12.0, 36.0])
    a = _as_set(neighbor_list_dense(positions, box, 3.5), 50)
    b = _as_set(neighbor_list_dense(shifted, box, 3.5), 50)
    assert a == b


@pytest.mark.slow
def test_cell_list_clustered_molecules():
    """Water-like clustering (3 atoms per site) must not overflow per-cell
    buckets silently — regression for a bug caught in live verification."""
    from admp_tpu.systems import water_system

    s = water_system(n_side=4, spacing=3.1, jitter=0.12, seed=9)
    dense = neighbor_list_dense(s["positions"], s["box"], 3.0)
    cell = neighbor_list_cell(s["positions"], s["box"], 3.0)
    n = s["positions"].shape[0]
    assert not bool(cell.did_overflow)
    assert _as_set(cell, n) == _as_set(dense, n)


def test_emitted_pairs_are_i_sorted():
    """Both strategies emit i-sorted lists by default (NeighborList.i_sorted)
    — the contract EngineConfig.pairs_i_sorted relies on for its
    sorted-segment backward gathers. Padding (n, n) must sort last."""
    from admp_tpu.systems import water_system

    s = water_system(n_side=4, spacing=3.1, jitter=0.12, seed=9)
    n = s["positions"].shape[0]
    for nl in (
        neighbor_list_dense(s["positions"], s["box"], 3.0),
        neighbor_list_cell(s["positions"], s["box"], 3.0),
    ):
        assert nl.i_sorted
        ii = np.asarray(nl.pairs[:, 0])
        assert np.all(np.diff(ii) >= 0)
        # canonical convention intact: real entries keep i < j
        pairs = np.asarray(nl.pairs)
        real = pairs[pairs[:, 0] < n]
        assert np.all(real[:, 0] < real[:, 1])
    unsorted = neighbor_list_cell(s["positions"], s["box"], 3.0, sort_i=False)
    assert not unsorted.i_sorted
    assert _as_set(unsorted, n) == _as_set(
        neighbor_list_cell(s["positions"], s["box"], 3.0), n
    )


def test_take_rows_sorted_gradients_match_plain_gather():
    """take_rows_sorted == table[idx] to second order for sorted idx."""
    import jax

    from admp_tpu.ops.realspace import take_rows_sorted

    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.standard_normal((12, 5)), dtype=jnp.float32)
    idx = jnp.asarray(np.sort(rng.integers(0, 12, 40)).astype(np.int32))
    w = jnp.asarray(rng.standard_normal((40, 5)), dtype=jnp.float32)

    f_sorted = lambda t: jnp.sum(jnp.sin(take_rows_sorted(t, idx)) * w)
    f_plain = lambda t: jnp.sum(jnp.sin(t[idx]) * w)
    assert float(f_sorted(table)) == float(f_plain(table))
    g1, g2 = jax.grad(f_sorted)(table), jax.grad(f_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=0, atol=0)
    h1 = jax.grad(lambda t: jnp.sum(jax.grad(f_sorted)(t) ** 2))(table)
    h2 = jax.grad(lambda t: jnp.sum(jax.grad(f_plain)(t) ** 2))(table)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=0, atol=0)
