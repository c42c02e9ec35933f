"""Distributed 3D FFT: pencil decomposition with all_to_all transposes over ICI.

The reference computes ``jnp.fft.fftn`` on a single device
(reference: admp/recip.py:410) — its only scaling strategy is a bigger chip.
Here the mesh charge grid is sharded over the leading grid axis across devices;
the FFT is computed as
    local FFT over (K2, K3)  ->  all_to_all transpose (K1-shard -> K2-shard)
    ->  local FFT over K1
which keeps every butterfly on-chip and rides the interconnect exactly once.
Designed for use inside ``jax.shard_map``; differentiable (the collectives'
transposes are themselves collectives, so reverse-mode AD shards too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fft3d_pencil(local_slab, axis_name):
    """Forward 3D FFT of a grid sharded over its leading axis.

    Args:
      local_slab: (K1/P, K2, K3) local real or complex block.
      axis_name: mesh axis name over which the grid is sharded.

    Returns:
      (K1, K2/P, K3) local block of the full FFT, sharded over the *second*
      grid axis (the "transposed pencil" layout). Callers doing diagonal
      k-space multiplies never need to transpose back.
    """
    # FFT over the two locally-complete axes
    x = jnp.fft.fftn(local_slab.astype(jnp.complex64 if local_slab.dtype == jnp.float32 else jnp.complex128), axes=(1, 2))
    # redistribute: split K2 across devices, gather K1
    x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=0, tiled=True)
    # FFT over the now-complete leading axis
    return jnp.fft.fft(x, axis=0)


def rfft3d_pencil(local_slab, axis_name):
    """Real-input variant of :func:`fft3d_pencil`: the local K3 axis uses an
    rfft (half spectrum), halving interconnect traffic and per-mode work.

    Returns (K1, K2/P, K3//2 + 1) — pair with Hermitian multiplicity weights
    (see ops/reciprocal._hermitian_weights) for Parseval sums.

    Implementation note: a true rfft's transpose rule currently clashes with
    shard_map's varying-axes tracking, so the local K3 transform is a full
    complex FFT sliced to the half spectrum — the interconnect transpose and
    all downstream k-space work still operate on half the modes.
    """
    k3h = local_slab.shape[2] // 2 + 1
    x = jnp.fft.fft(
        local_slab.astype(
            jnp.complex64 if local_slab.dtype == jnp.float32 else jnp.complex128
        ),
        axis=2,
    )[:, :, :k3h]
    x = jnp.fft.fft(x, axis=1)
    x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(x, axis=0)


def local_slab_index(axis_name):
    """Index of this device's slab along the sharded axis."""
    return jax.lax.axis_index(axis_name)
