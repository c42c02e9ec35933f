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
