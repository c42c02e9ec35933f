"""Chunked (memory-bounded) execution paths must be bit-compatible with the
monolithic ones — these are the 100k-atom scaling paths."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from admp_tpu import convert_cart2harm, neighbor_list_dense
from admp_tpu.models.pme import pme_real_energy
from admp_tpu.ops.frames import construct_local_frames
from admp_tpu.ops.harmonics import rot_local2global
from admp_tpu.ops.reciprocal import spread_to_mesh
from tests.watergen import water_arrays

M_SCALES = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])


def _setup():
    s = water_arrays(n_side=3, spacing=3.1, jitter=0.12, seed=55)
    nl = neighbor_list_dense(s["positions"], s["box"], 4.0)
    pos = jnp.asarray(s["positions"])
    box = jnp.asarray(s["box"])
    ql = convert_cart2harm(jnp.asarray(s["q_cart"]), 2)
    frames = construct_local_frames(
        pos, box, jnp.asarray(s["axis_types"]), jnp.asarray(s["axis_indices"])
    )
    qg = rot_local2global(ql, frames, 2)
    return s, jnp.asarray(nl.pairs), pos, box, qg


@pytest.mark.slow
def test_pair_chunked_real_space():
    s, pairs, pos, box, qg = _setup()
    cov = jnp.asarray(s["covalent_map"])
    args = (qg, None, None, None, M_SCALES, None, cov, 0.7, 2, False)
    e_full = pme_real_energy(pos, box, pairs, *args)
    e_chunk = pme_real_energy(pos, box, pairs, *args, pair_chunk=64)
    np.testing.assert_allclose(float(e_chunk), float(e_full), rtol=1e-12)
    g_full = jax.grad(lambda p: pme_real_energy(p, box, pairs, *args))(pos)
    g_chunk = jax.grad(
        lambda p: pme_real_energy(p, box, pairs, *args, pair_chunk=64)
    )(pos)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_full), atol=1e-10)


def test_atom_chunked_spread():
    s, pairs, pos, box, qg = _setup()
    grid = (18, 18, 18)
    full = spread_to_mesh(pos, box, qg, grid, 2)
    chunked = spread_to_mesh(pos, box, qg, grid, 2, atom_chunk=16)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-12)
    g_full = jax.grad(lambda p: jnp.sum(spread_to_mesh(p, box, qg, grid, 2) ** 2))(pos)
    g_chunk = jax.grad(
        lambda p: jnp.sum(spread_to_mesh(p, box, qg, grid, 2, atom_chunk=16) ** 2)
    )(pos)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_full), atol=1e-9)
