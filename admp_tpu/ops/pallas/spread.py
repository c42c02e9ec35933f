"""Pallas TPU kernel for B-spline charge spreading.

The XLA lowering of the (N, 6, 6, 6) -> (K1, K2, K3) scatter-add serializes
random-index updates through HBM. This kernel decomposes the mesh into x-slabs:
atoms are bucketed by their base x-row (one cheap sort), each program owns one
slab, keeps it in VMEM, and accumulates each atom's 6x6x6 stencil block with
dynamic-slice updates — HBM sees each slab exactly once. Slabs are padded by
the stencil halo (5 points per axis) and the periodic wrap is folded afterwards
with dense XLA adds.

This is the forward spread only; the adjoint (force interpolation) is the
corresponding block gather, which XLA already executes efficiently.

STATUS: numerically validated in Pallas interpret mode (tests/test_pallas.py);
the Mosaic TPU compiler currently rejects the 3-axis dynamic-slice
read-modify-write with a 6-wide (sub-lane-width, unaligned) last dimension
(remote-compile INTERNAL error). Production spreading therefore stays on the
XLA flat scatter (ops/reciprocal.py). The planned fix is lane-aligned windowed
accumulation: read a (6, 6, 128)-aligned window, place the 6-wide block with a
dynamic in-register roll, and write back — tracked for the next round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pragma: no cover - exercised on TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

HALO = 5  # stencil extent - 1 (order-6 spline touches 6 points per axis)


def pallas_spread_available() -> bool:
    return _PALLAS_OK


def _spread_kernel(counts_ref, m_u0_ref, q_ref, out_ref):
    """One program = one x-slab. Atoms are pre-bucketed and padded per slab.

    counts_ref: (1,) SMEM — number of real atoms in this slab's bucket.
    m_u0_ref:   (A, 3) VMEM — base indices, x already slab-relative.
    q_ref:      (A, 6, 6, 6) VMEM — stencil weights.
    out_ref:    (W+HALO, K2+HALO, K3+HALO) VMEM — padded slab accumulator.
    """
    out_ref[...] = jnp.zeros_like(out_ref)
    count = counts_ref[pl.program_id(0)]
    a_max = m_u0_ref.shape[1]

    def body(k, _):
        @pl.when(k < count)
        def _():
            x0 = m_u0_ref[0, k, 0]
            y0 = m_u0_ref[0, k, 1]
            z0 = m_u0_ref[0, k, 2]
            block = q_ref[0, k]
            cur = out_ref[0, pl.ds(x0, 6), pl.ds(y0, 6), pl.ds(z0, 6)]
            out_ref[0, pl.ds(x0, 6), pl.ds(y0, 6), pl.ds(z0, 6)] = cur + block
        return 0

    jax.lax.fori_loop(0, a_max, body, 0)


@functools.partial(jax.jit, static_argnames=("grid_shape", "n_slabs", "interpret"))
def _pallas_spread_impl(m_u0, q_points, grid_shape, n_slabs, interpret=False):
    k1, k2, k3 = grid_shape
    n = m_u0.shape[0]
    width = -(-k1 // n_slabs)

    # base index of the stencil block (offsets are -3..2 relative to m_u0)
    base = jnp.stack(
        [
            jnp.mod(m_u0[:, 0] - 3, k1),
            jnp.mod(m_u0[:, 1] - 3, k2),
            jnp.mod(m_u0[:, 2] - 3, k3),
        ],
        axis=-1,
    ).astype(jnp.int32)

    slab_id = base[:, 0] // width
    order = jnp.argsort(slab_id)
    sorted_ids = slab_id[order]
    base_s = base[order]
    q_s = q_points[order]

    # per-slab bucket layout with a uniform capacity
    starts = jnp.searchsorted(sorted_ids, jnp.arange(n_slabs))
    ends = jnp.searchsorted(sorted_ids, jnp.arange(n_slabs) + 1)
    counts = (ends - starts).astype(jnp.int32)
    cap = n  # conservative static capacity; masked by counts

    # gather each slab's atoms into (n_slabs, cap, ...) padded arrays
    take = starts[:, None] + jnp.arange(cap)[None, :]
    take = jnp.minimum(take, n - 1)
    m_b = base_s[take]  # (P, cap, 3)
    m_b = m_b.at[..., 0].add(-(jnp.arange(n_slabs) * width)[:, None])
    q_b = q_s[take]

    out = pl.pallas_call(
        _spread_kernel,
        grid=(n_slabs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cap, 3), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, cap, 6, 6, 6), lambda p: (p, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, width + HALO, k2 + HALO, k3 + HALO),
            lambda p: (p, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_slabs, width + HALO, k2 + HALO, k3 + HALO), q_points.dtype
        ),
        interpret=interpret,
    )(counts, m_b, q_b)

    # fold padded slabs back into the periodic (K1, K2, K3) mesh
    mesh_pad = jnp.zeros((k1 + width + HALO, k2 + HALO, k3 + HALO), q_points.dtype)
    for p in range(n_slabs):
        mesh_pad = jax.lax.dynamic_update_slice(
            mesh_pad,
            jax.lax.dynamic_slice(
                mesh_pad, (p * width, 0, 0), (width + HALO, k2 + HALO, k3 + HALO)
            )
            + out[p],
            (p * width, 0, 0),
        )
    # x wrap
    mesh = mesh_pad[:k1]
    mesh = mesh.at[: width + HALO].add(mesh_pad[k1:])
    # y, z wraps
    mesh = mesh.at[:, :HALO, :].add(mesh[:, k2:, :])[:, :k2, :]
    mesh = mesh.at[:, :, :HALO].add(mesh[:, :, k3:])[:, :, :k3]
    return mesh


def spread_to_mesh_pallas(m_u0, q_points, grid_shape, n_slabs=8, interpret=False):
    """Spread (N, 6, 6, 6) stencil weights at base indices m_u0 onto the mesh.

    Equivalent to the XLA scatter path in ops/reciprocal.py (same math, same
    result); forward runs as a Pallas slab kernel.
    """
    return _pallas_spread_impl(
        m_u0, q_points, tuple(int(k) for k in grid_shape), int(n_slabs), interpret
    )
