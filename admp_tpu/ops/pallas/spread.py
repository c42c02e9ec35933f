"""Pallas TPU kernel for B-spline charge spreading.

The XLA lowering of the (N, 6, 6, 6) -> (K1, K2, K3) scatter-add serializes
random-index updates through HBM. This kernel decomposes the mesh into x-slabs:
atoms are bucketed by their base x-row (one cheap sort), each program owns one
slab, keeps it in VMEM, and accumulates each atom's 6x6x6 stencil block — HBM
sees each slab exactly once.

Mosaic cannot lower unaligned sub-tile dynamic read-modify-writes (the last two
ref dimensions are (8, 128)-tiled), so the per-atom update is done on an
ALIGNED (6, 16, 256) window: the y/z base indices are rounded down to the tile
grid and the 6-wide block is placed at its in-window offset with separable
one-hot select placement (pure VPU; Mosaic's compile helper also crashes on
dot_general inside fori_loop). Slabs carry halo padding; the periodic wrap is
folded afterwards with dense XLA adds.

This is the forward spread; the adjoint (force interpolation) is the
corresponding block gather, which XLA already executes efficiently.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:  # pragma: no cover - exercised on TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

# index-map literals must be int32: under jax_enable_x64 a bare `0` traces
# as an i64 constant and Mosaic cannot legalize the transform function's
# `func.return (i64)` (np scalar keeps its dtype through tracing)
_I0 = np.int32(0)

HALO = 5          # stencil extent - 1 (order-6 spline touches 6 points/axis)
_YW = 16          # aligned window extent in the sublane (y) dimension
_ZW = 256         # aligned window extent in the lane (z) dimension


def pallas_spread_available() -> bool:
    return _PALLAS_OK


def _make_spread_kernel(order: int, n_ch: int):
    """Kernel factory: one program = one x-slab; ``order``-wide stencils and
    ``n_ch`` channels sharing indices (dispersion spreads C6/C8/C10 on the
    same B-spline geometry).

    counts_ref: (P,) SMEM — real atom count per slab bucket.
    m_u0_ref:   (1, A, 3) VMEM — base indices, x slab-relative.
    q_ref:      (1, A, C*order, order^2) VMEM — stencil weights, channel-
                stacked rows, (y, z) flattened columns.
    out_ref:    (1, C, W+halo, K2pad, K3pad) VMEM — padded slab accumulators.

    The order-wide block is placed at its in-window (yo, zo) offset with
    separable one-hot SELECT placement (static j/l unroll, vectorized
    compares) — pure VPU work. Mosaic's compile helper crashes on
    dot_general inside fori_loop, so no MXU placement here.
    """

    def kernel(counts_ref, m_u0_ref, q_ref, out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)
        count = counts_ref[pl.program_id(0)]
        a_max = m_u0_ref.shape[1]
        # int32 loop bounds: under jax_enable_x64 python-int bounds make the
        # induction variable int64, and Mosaic's int64 convert_element_type
        # lowering rule recurses without terminating (observed as
        # RecursionError on every x64 run that reaches this kernel)
        lo = jnp.asarray(0, jnp.int32)
        hi = jnp.asarray(a_max, jnp.int32)

        y_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _YW, 1), 1)
        z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _ZW), 2)

        def body(k, _):
            @pl.when(k < count)
            def _():
                x0 = m_u0_ref[0, k, 0]
                y0 = m_u0_ref[0, k, 1]
                z0 = m_u0_ref[0, k, 2]
                # lax.div, not //: jnp.floor_divide wraps python-int literals
                # in an i64 helper under jax_enable_x64, and Mosaic's
                # int64->f32 convert rule recurses forever (indices are
                # non-negative, so truncating division IS floor division)
                eight = jnp.asarray(8, jnp.int32)
                o28 = jnp.asarray(128, jnp.int32)
                yb = jax.lax.div(y0, eight) * eight
                zb = jax.lax.div(z0, o28) * o28
                yo = y0 - yb
                zo = z0 - zb
                blk = q_ref[0, k]  # (C*order, order^2)
                # z-combine once per (j, l): the one-hot selects are shared
                # by all channels (identical geometry)
                upd = jnp.zeros((n_ch * order, _YW, _ZW), blk.dtype)
                for j in range(order):
                    tmp = jnp.zeros((n_ch * order, 1, _ZW), blk.dtype)
                    for l in range(order):
                        sel = (z_iota == zo + l).astype(blk.dtype)
                        tmp = tmp + blk[:, j * order + l][:, None, None] * sel
                    pick = (y_iota == yo + j).astype(blk.dtype)
                    upd = upd + tmp * pick
                yb = pl.multiple_of(yb, 8)
                zb = pl.multiple_of(zb, 128)
                for c in range(n_ch):
                    cur = out_ref[
                        0, c, pl.ds(x0, order), pl.ds(yb, _YW), pl.ds(zb, _ZW)
                    ]
                    out_ref[
                        0, c, pl.ds(x0, order), pl.ds(yb, _YW), pl.ds(zb, _ZW)
                    ] = cur + upd[c * order:(c + 1) * order]
            return jnp.asarray(0, jnp.int32)

        jax.lax.fori_loop(lo, hi, body, jnp.asarray(0, jnp.int32))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("grid_shape", "n_slabs", "interpret", "order")
)
def _pallas_spread_impl(m_u0, q_points, grid_shape, n_slabs, interpret=False,
                        order=6):
    """q_points: (N, C, order^3) channel-stacked stencil values. Returns
    ((C, K1, K2, K3) meshes, overflow flag)."""
    k1, k2, k3 = grid_shape
    n = m_u0.shape[0]
    n_ch = q_points.shape[1]
    halo = order - 1
    half = order // 2
    width = -(-k1 // n_slabs)
    k2pad = k2 + _YW
    k3pad = k3 + _ZW

    # base index of the stencil block (offsets are -half..half-1 rel. m_u0)
    base = jnp.stack(
        [
            jnp.mod(m_u0[:, 0] - half, k1),
            jnp.mod(m_u0[:, 1] - half, k2),
            jnp.mod(m_u0[:, 2] - half, k3),
        ],
        axis=-1,
    ).astype(jnp.int32)

    slab_id = base[:, 0] // width
    sort_order = jnp.argsort(slab_id)
    sorted_ids = slab_id[sort_order]
    base_s = base[sort_order]
    q_s = q_points[sort_order].reshape(n, n_ch * order, order * order)

    # int32 index arithmetic throughout: under jax_enable_x64 a bare arange is
    # int64 and scatter-adding it into the int32 base indices is a JAX
    # FutureWarning on its way to a hard error (ADVICE round 2)
    slab_iota = jnp.arange(n_slabs, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_ids, slab_iota).astype(jnp.int32)
    ends = jnp.searchsorted(sorted_ids, slab_iota + 1).astype(jnp.int32)
    counts = ends - starts
    # static per-slab capacity: 2.5x the mean, bounded by n. Keeping it small
    # matters: Pallas double-buffers VMEM inputs, and the slab accumulator is
    # already several MB. Overflow is reported to the caller.
    cap = min(n, int(np.ceil(n / n_slabs * 2.5)) + 32)
    overflow = jnp.any(counts > cap)

    take = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    take = jnp.minimum(take, n - 1)
    m_b = base_s[take]
    m_b = m_b.at[..., 0].add(-(slab_iota * width)[:, None])
    q_b = q_s[take]

    out = pl.pallas_call(
        _make_spread_kernel(order, n_ch),
        grid=(n_slabs,),
        in_specs=[
            # explicit int32 index map: the synthesized default for a
            # whole-array SMEM spec returns an i64 literal under x64,
            # which Mosaic cannot legalize (func.return (i64))
            pl.BlockSpec((n_slabs,), lambda p: (_I0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cap, 3), lambda p: (p, _I0, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, cap, n_ch * order, order * order),
                lambda p: (p, _I0, _I0, _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_ch, width + halo, k2pad, k3pad),
            lambda p: (p, _I0, _I0, _I0, _I0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_slabs, n_ch, width + halo, k2pad, k3pad), q_points.dtype
        ),
        interpret=interpret,
    )(counts, m_b, q_b)

    # fold padded slabs back into the periodic (C, K1, K2, K3) meshes
    mesh_pad = jnp.zeros(
        (n_ch, n_slabs * width + halo, k2pad, k3pad), q_points.dtype
    )
    for p in range(n_slabs):
        mesh_pad = jax.lax.dynamic_update_slice(
            mesh_pad,
            jax.lax.dynamic_slice(
                mesh_pad, (0, p * width, 0, 0),
                (n_ch, width + halo, k2pad, k3pad),
            )
            + out[p],
            (0, p * width, 0, 0),
        )
    # x wrap (slabs may extend past k1)
    extra = mesh_pad.shape[1] - k1
    mesh = mesh_pad[:, :k1]
    mesh = mesh.at[:, :extra].add(mesh_pad[:, k1:])
    # y, z wraps
    mesh = mesh.at[:, :, : _YW, :].add(mesh[:, :, k2:, :])[:, :, :k2, :]
    mesh = mesh.at[:, :, :, : _ZW].add(mesh[:, :, :, k3:])[:, :, :, :k3]
    return mesh, overflow


def spread_to_mesh_pallas(m_u0, q_points, grid_shape, n_slabs=16, interpret=False):
    """Spread (N, 6, 6, 6) stencil weights at base indices m_u0 onto the mesh.

    Equivalent to the XLA scatter path in ops/reciprocal.py (same math, same
    result up to f32 summation order); forward runs as a Pallas slab kernel.
    Returns (mesh, overflow_flag) — on overflow (a slab bucket denser than the
    2.5x-mean static capacity) callers must fall back to the XLA scatter.
    """
    n = q_points.shape[0]
    mesh, overflow = _pallas_spread_impl(
        m_u0, q_points.reshape(n, 1, 216),
        tuple(int(k) for k in grid_shape), int(n_slabs), interpret,
    )
    return mesh[0], overflow


# ---------------------------------------------------------------------------
# Differentiable production wrapper
# ---------------------------------------------------------------------------


def _xla_scatter(m_u0, q_points, grid_shape):
    k1, k2, k3 = grid_shape
    offsets = jnp.arange(-3, 3)
    i1 = jnp.mod(m_u0[:, 0:1] + offsets[None], k1)
    i2 = jnp.mod(m_u0[:, 1:2] + offsets[None], k2)
    i3 = jnp.mod(m_u0[:, 2:3] + offsets[None], k3)
    flat = (
        (i1[:, :, None, None] * k2 + i2[:, None, :, None]) * k3
        + i3[:, None, None, :]
    ).reshape(-1)
    mesh = jnp.zeros((k1 * k2 * k3,), q_points.dtype)
    return mesh.at[flat].add(q_points.reshape(-1)).reshape(k1, k2, k3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def spread_blocks(m_u0, q_points, grid_shape, n_slabs=16, interpret=False):
    """Differentiable block spread: Pallas slab kernel forward (with automatic
    fallback to the XLA scatter if a slab bucket overflows), flat-gather
    adjoint. Same contract as the XLA scatter path. ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU testing)."""
    n = q_points.shape[0]
    mesh, overflow = _pallas_spread_impl(
        m_u0, q_points.reshape(n, 1, 216), grid_shape, n_slabs, interpret
    )
    return jax.lax.cond(
        overflow,
        lambda: _xla_scatter(m_u0, q_points, grid_shape),
        lambda: mesh[0],
    )


def _spread_blocks_fwd(m_u0, q_points, grid_shape, n_slabs=16, interpret=False):
    return spread_blocks(m_u0, q_points, grid_shape, n_slabs, interpret), m_u0


def _flat_stencil_indices(m_u0, grid_shape, order):
    k1, k2, k3 = grid_shape
    offsets = jnp.arange(-(order // 2), order // 2)
    i1 = jnp.mod(m_u0[:, 0:1] + offsets[None], k1)
    i2 = jnp.mod(m_u0[:, 1:2] + offsets[None], k2)
    i3 = jnp.mod(m_u0[:, 2:3] + offsets[None], k3)
    return (
        (i1[:, :, None, None] * k2 + i2[:, None, :, None]) * k3
        + i3[:, None, None, :]
    ).reshape(-1)


def _flat_gather(m_u0, g_mesh, grid_shape, order):
    n = m_u0.shape[0]
    n_ch = g_mesh.shape[0]
    flat = _flat_stencil_indices(m_u0, grid_shape, order)
    g_flat = g_mesh.reshape(n_ch, -1)
    if n_ch == 1:
        return g_flat[0][flat].reshape(n, 1, order ** 3)
    return jnp.stack(
        [g_flat[c][flat].reshape(n, order ** 3) for c in range(n_ch)], axis=1
    )


def _spread_blocks_bwd(grid_shape, n_slabs, interpret, m_u0, g_mesh):
    # windowed-gather kernel (the XLA flat gather is per-element bound:
    # ~62M elem/s measured — examples/gather_98k_tpu.out); flat-gather
    # fallback when a bucket overflowed (the forward used the scatter then,
    # and the kernel would drop the overflow atoms' cotangents)
    n = m_u0.shape[0]
    g_k, overflow = _pallas_gather_slabs_impl(
        m_u0, g_mesh[None], grid_shape, n_slabs, interpret
    )
    g_q = jax.lax.cond(
        overflow,
        lambda: _flat_gather(m_u0, g_mesh[None], grid_shape, 6),
        lambda: g_k,
    )
    return None, g_q.reshape(n, 6, 6, 6)


spread_blocks.defvjp(_spread_blocks_fwd, _spread_blocks_bwd)


# ---------------------------------------------------------------------------
# Multi-channel variant (dispersion: C6/C8/C10 share the stencil geometry)
# ---------------------------------------------------------------------------


def _xla_scatter_multi(m_u0, q_points, grid_shape, order):
    k1, k2, k3 = grid_shape
    n, n_ch = q_points.shape[:2]
    flat = _flat_stencil_indices(m_u0, grid_shape, order)
    kcube = k1 * k2 * k3
    all_idx = (
        flat.reshape(1, n, order ** 3)
        + (jnp.arange(n_ch) * kcube)[:, None, None]
    )
    vals = jnp.swapaxes(q_points, 0, 1)  # (C, N, order^3)
    mesh = jnp.zeros((n_ch * kcube,), q_points.dtype)
    mesh = mesh.at[all_idx.reshape(-1)].add(vals.reshape(-1))
    return mesh.reshape(n_ch, k1, k2, k3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def spread_blocks_multi(m_u0, q_points, grid_shape, order, n_slabs=16,
                        interpret=False):
    """Multi-channel differentiable block spread: ``q_points`` is
    (N, C, order^3); returns (C, K1, K2, K3). Pallas slab kernel forward
    (XLA multi-channel scatter fallback on bucket overflow), flat-gather
    adjoint."""
    mesh, overflow = _pallas_spread_impl(
        m_u0, q_points, grid_shape, n_slabs, interpret, order
    )
    return jax.lax.cond(
        overflow,
        lambda: _xla_scatter_multi(m_u0, q_points, grid_shape, order),
        lambda: mesh,
    )


def _spread_blocks_multi_fwd(m_u0, q_points, grid_shape, order, n_slabs=16,
                             interpret=False):
    out = spread_blocks_multi(m_u0, q_points, grid_shape, order, n_slabs,
                              interpret)
    return out, m_u0


def _spread_blocks_multi_bwd(grid_shape, order, n_slabs, interpret, m_u0,
                             g_mesh):
    g_k, overflow = _pallas_gather_slabs_impl(
        m_u0, g_mesh, grid_shape, n_slabs, interpret, order
    )
    g_q = jax.lax.cond(
        overflow,
        lambda: _flat_gather(m_u0, g_mesh, grid_shape, order),
        lambda: g_k,
    )
    return None, g_q


spread_blocks_multi.defvjp(_spread_blocks_multi_fwd, _spread_blocks_multi_bwd)


# ---------------------------------------------------------------------------
# 2-D (x, y)-blocked variant for large grids (K=320-class): the 1-D slab
# kernel's block is (width+halo, K2pad, K3pad) — full y/z extent — which
# exceeds VMEM for K >~ 160 at any slab count (ROADMAP round 2: K=320
# "NOT eligible, verified"). Blocking y as well bounds the accumulator at
# (wx+halo, wy+_YW, K3pad); the kernel body is REUSED unchanged (it only
# sees block-relative indices and the out_ref shape).
# ---------------------------------------------------------------------------


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def vmem_block_bytes(shape4, itembytes: int = 4) -> int:
    """VMEM bytes of a block after Mosaic's (8, 128) tile padding of the last
    two dims (measured the hard way: a (cap, 6, 36) f32 q-points block
    allocates cap*8*128*4 bytes — 4.7x the logical size — which put the
    98k/K=320 2-D spread 8 MB over the 16 MB scoped-vmem limit when the
    budget counted logical bytes only)."""
    *lead, a, b = shape4
    n_lead = 1
    for d in lead:
        n_lead *= d
    return n_lead * _roundup(a, 8) * _roundup(b, 128) * itembytes


def pick_blocks_2d(grid_shape, order: int, n_ch: int, n_atoms: int):
    """Choose an (nx, ny) program grid whose accumulator + double-buffered
    atom inputs fit the VMEM budget (tile-padded sizes, see
    vmem_block_bytes). Returns None when nothing fits (or the grid doesn't
    divide evenly)."""
    k1, k2, k3 = grid_shape
    k3pad = k3 + _ZW
    for nx, ny in ((8, 8), (16, 8), (16, 16), (32, 8), (32, 16), (64, 8),
                   (32, 32), (64, 16), (64, 32), (64, 64)):
        if k1 % nx or k2 % ny:
            continue
        wx, wy = k1 // nx, k2 // ny
        if wy % 8:
            continue
        acc = vmem_block_bytes((n_ch, wx + order - 1, wy + _YW, k3pad))
        cap = min(n_atoms, int(np.ceil(n_atoms / (nx * ny) * 2.5)) + 32)
        inputs = (vmem_block_bytes((cap, n_ch * order, order * order))
                  + vmem_block_bytes((1, cap, 3)))
        if 2 * acc + 2 * inputs <= 13 * 1024 * 1024 and acc <= 6 * 1024 * 1024:
            return nx, ny
    return None


@functools.partial(
    jax.jit, static_argnames=("grid_shape", "nx", "ny", "interpret", "order")
)
def _pallas_spread2d_impl(m_u0, q_points, grid_shape, nx, ny, interpret=False,
                          order=6):
    """q_points: (N, C, order^3). Returns ((C, K1, K2, K3) meshes, overflow).

    Requires K1 % nx == 0 and K2 % ny == 0 (pick_blocks_2d guarantees it).
    """
    k1, k2, k3 = grid_shape
    n = m_u0.shape[0]
    n_ch = q_points.shape[1]
    halo = order - 1
    half = order // 2
    wx, wy = k1 // nx, k2 // ny
    nb = nx * ny
    k3pad = k3 + _ZW

    base = jnp.stack(
        [
            jnp.mod(m_u0[:, 0] - half, k1),
            jnp.mod(m_u0[:, 1] - half, k2),
            jnp.mod(m_u0[:, 2] - half, k3),
        ],
        axis=-1,
    ).astype(jnp.int32)

    bid = (base[:, 0] // wx) * ny + base[:, 1] // wy
    sort_order = jnp.argsort(bid)
    sorted_ids = bid[sort_order]
    base_s = base[sort_order]
    q_s = q_points[sort_order].reshape(n, n_ch * order, order * order)

    b_iota = jnp.arange(nb, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_ids, b_iota).astype(jnp.int32)
    ends = jnp.searchsorted(sorted_ids, b_iota + 1).astype(jnp.int32)
    counts = ends - starts
    cap = min(n, int(np.ceil(n / nb * 2.5)) + 32)
    overflow = jnp.any(counts > cap)

    take = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    take = jnp.minimum(take, n - 1)
    m_b = base_s[take]
    m_b = m_b.at[..., 0].add(-((b_iota // ny) * wx)[:, None])
    m_b = m_b.at[..., 1].add(-((b_iota % ny) * wy)[:, None])
    q_b = q_s[take]

    out = pl.pallas_call(
        _make_spread_kernel(order, n_ch),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((nb,), lambda p: (_I0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cap, 3), lambda p: (p, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, cap, n_ch * order, order * order),
                lambda p: (p, _I0, _I0, _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_ch, wx + halo, wy + _YW, k3pad),
            lambda p: (p, _I0, _I0, _I0, _I0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nb, n_ch, wx + halo, wy + _YW, k3pad), q_points.dtype
        ),
        interpret=interpret,
    )(counts, m_b, q_b)
    out = out.reshape(nx, ny, n_ch, wx + halo, wy + _YW, k3pad)

    # fold stage 1: merge the y-blocks of each x row (ny slice-adds)
    ymerged = jnp.zeros(
        (nx, n_ch, wx + halo, k2 + _YW, k3pad), q_points.dtype
    )
    for py in range(ny):
        ymerged = jax.lax.dynamic_update_slice(
            ymerged,
            jax.lax.dynamic_slice(
                ymerged, (0, 0, 0, py * wy, 0),
                (nx, n_ch, wx + halo, wy + _YW, k3pad),
            )
            + out[:, py],
            (0, 0, 0, py * wy, 0),
        )
    # fold stage 2: merge the x blocks (nx slice-adds)
    mesh_pad = jnp.zeros(
        (n_ch, k1 + halo, k2 + _YW, k3pad), q_points.dtype
    )
    for px in range(nx):
        mesh_pad = jax.lax.dynamic_update_slice(
            mesh_pad,
            jax.lax.dynamic_slice(
                mesh_pad, (0, px * wx, 0, 0),
                (n_ch, wx + halo, k2 + _YW, k3pad),
            )
            + ymerged[px],
            (0, px * wx, 0, 0),
        )
    # periodic wraps
    mesh = mesh_pad[:, :k1]
    mesh = mesh.at[:, :halo].add(mesh_pad[:, k1:])
    mesh = mesh.at[:, :, : _YW, :].add(mesh[:, :, k2:, :])[:, :, :k2, :]
    mesh = mesh.at[:, :, :, : _ZW].add(mesh[:, :, :, k3:])[:, :, :, :k3]
    return mesh, overflow


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def spread_blocks_2d(m_u0, q_points, grid_shape, nx, ny, interpret=False):
    """Differentiable 2-D blocked spread: single-channel (N, 6, 6, 6) stencil
    values -> (K1, K2, K3) mesh; XLA-scatter fallback on bucket overflow,
    flat-gather adjoint (the same contract as spread_blocks)."""
    n = q_points.shape[0]
    mesh, overflow = _pallas_spread2d_impl(
        m_u0, q_points.reshape(n, 1, 216), grid_shape, nx, ny, interpret
    )
    return jax.lax.cond(
        overflow,
        lambda: _xla_scatter(m_u0, q_points, grid_shape),
        lambda: mesh[0],
    )


def _spread_blocks_2d_fwd(m_u0, q_points, grid_shape, nx, ny, interpret=False):
    return spread_blocks_2d(m_u0, q_points, grid_shape, nx, ny, interpret), m_u0


def _spread_blocks_2d_bwd(grid_shape, nx, ny, interpret, m_u0, g_mesh):
    n = m_u0.shape[0]
    g_k, overflow = _pallas_gather2d_impl(
        m_u0, g_mesh[None], grid_shape, nx, ny, interpret
    )
    g_q = jax.lax.cond(
        overflow,
        lambda: _flat_gather(m_u0, g_mesh[None], grid_shape, 6),
        lambda: g_k,
    )
    return None, g_q.reshape(n, 6, 6, 6)


spread_blocks_2d.defvjp(_spread_blocks_2d_fwd, _spread_blocks_2d_bwd)


# ---------------------------------------------------------------------------
# Windowed-gather adjoint kernels.
#
# The spread adjoint (force interpolation) is a gather of each atom's
# order^3 stencil window from the cotangent mesh. The XLA flat gather is
# PER-ELEMENT bound on TPU (~62M elem/s measured at 98k/K=320 — 339 ms for
# 21.2M stencil values, insensitive to index ordering; sliced lax.gather is
# 29x worse; examples/gather_98k_tpu.out), which made it the single largest
# cost of the 98k step. These kernels mirror the forward spread's block
# decomposition in reverse: the cotangent mesh is sliced into the SAME
# halo-padded blocks (overlap materialized by two row-takes — sequential HBM
# traffic), each program walks its atom bucket and extracts the (6, 6, 6)
# window with the same aligned-window one-hot selects the forward uses for
# placement — pure VPU work, no per-element gather anywhere.
# ---------------------------------------------------------------------------


def _make_gather_kernel(order: int, n_ch: int):
    """counts_ref: (P,) SMEM; m_u0_ref: (1, A, 3) VMEM block-relative bases;
    g_ref: (1, C, WX+halo, WYpad, K3pad) VMEM cotangent block;
    out_ref: (1, A, C*order, order^2) VMEM per-atom stencil cotangents."""

    def kernel(counts_ref, m_u0_ref, g_ref, out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)
        count = counts_ref[pl.program_id(0)]
        a_max = m_u0_ref.shape[1]
        lo = jnp.asarray(0, jnp.int32)
        hi = jnp.asarray(a_max, jnp.int32)

        y_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _YW, 1), 1)
        z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _ZW), 2)

        def body(k, _):
            @pl.when(k < count)
            def _():
                x0 = m_u0_ref[0, k, 0]
                y0 = m_u0_ref[0, k, 1]
                z0 = m_u0_ref[0, k, 2]
                eight = jnp.asarray(8, jnp.int32)
                o28 = jnp.asarray(128, jnp.int32)
                yb = jax.lax.div(y0, eight) * eight
                zb = jax.lax.div(z0, o28) * o28
                yo = y0 - yb
                zo = z0 - zb
                yb = pl.multiple_of(yb, 8)
                zb = pl.multiple_of(zb, 128)
                chans = []
                for c in range(n_ch):
                    cur = g_ref[
                        0, c, pl.ds(x0, order), pl.ds(yb, _YW), pl.ds(zb, _ZW)
                    ]  # (order, _YW, _ZW)
                    cols = []
                    for j in range(order):
                        pick = (y_iota == yo + j).astype(cur.dtype)
                        row_j = jnp.sum(cur * pick, axis=1)  # (order, _ZW)
                        for l in range(order):
                            sel = (z_iota[0] == zo + l).astype(cur.dtype)
                            cols.append(jnp.sum(row_j * sel, axis=-1))
                    chans.append(jnp.stack(cols, axis=-1))  # (order, order^2)
                out_ref[0, k] = jnp.concatenate(chans, axis=0)
            return jnp.asarray(0, jnp.int32)

        jax.lax.fori_loop(lo, hi, body, jnp.asarray(0, jnp.int32))

    return kernel


def _wrap_axis(g, axis: int, target: int):
    """Extend an axis to ``target`` by periodic tiling (handles extents
    larger than the axis itself — small grids wrap multiple times)."""
    reps = -(-target // g.shape[axis])
    if reps > 1:
        g = jnp.concatenate([g] * reps, axis=axis)
    return jax.lax.slice_in_dim(g, 0, target, axis=axis)


def _pad_cotangent(g_mesh, x_extent, order):
    """Periodic wrap-extension of the (C, K1, K2, K3) cotangent mesh — the
    exact transpose of the forward's wrap folds: padded position p reads the
    cotangent of grid point p mod K."""
    k1, k2, k3 = g_mesh.shape[1:]
    g = _wrap_axis(g_mesh, 3, k3 + _ZW)
    g = _wrap_axis(g, 2, k2 + _YW)
    g = _wrap_axis(g, 1, x_extent)
    return g


def _gather_postprocess(out, sort_order, take, counts, cap_pad, n, n_ch,
                        order):
    """Scatter per-slot kernel outputs back to atom order. Slots beyond a
    bucket's count are routed to a dump row (n) and discarded."""
    nb = counts.shape[0]
    rows = out.reshape(nb * cap_pad, n_ch * order, order * order)
    slot = jnp.arange(cap_pad, dtype=jnp.int32)[None, :]
    atom_ids = sort_order[take]
    ids = jnp.where(slot < counts[:, None], atom_ids, n).reshape(-1)
    res = jnp.zeros((n + 1,) + rows.shape[1:], rows.dtype)
    res = res.at[ids].set(rows)[:n]
    return res.reshape(n, n_ch, order ** 3)


def _pallas_gather2d_impl(m_u0, g_mesh, grid_shape, nx, ny, interpret=False,
                          order=6):
    """Adjoint of _pallas_spread2d_impl: (C, K1, K2, K3) cotangent ->
    ((N, C, order^3) stencil cotangents, overflow flag). Same bucketing as
    the forward; the overflow flag routes the caller to the flat-gather
    fallback (bucket-dropped atoms would silently get zero cotangents)."""
    k1, k2, k3 = grid_shape
    n = m_u0.shape[0]
    n_ch = g_mesh.shape[0]
    halo = order - 1
    half = order // 2
    wx, wy = k1 // nx, k2 // ny
    nb = nx * ny
    k3pad = k3 + _ZW

    base = jnp.stack(
        [
            jnp.mod(m_u0[:, 0] - half, k1),
            jnp.mod(m_u0[:, 1] - half, k2),
            jnp.mod(m_u0[:, 2] - half, k3),
        ],
        axis=-1,
    ).astype(jnp.int32)
    bid = (base[:, 0] // wx) * ny + base[:, 1] // wy
    sort_order = jnp.argsort(bid)
    sorted_ids = bid[sort_order]
    base_s = base[sort_order]

    b_iota = jnp.arange(nb, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_ids, b_iota).astype(jnp.int32)
    ends = jnp.searchsorted(sorted_ids, b_iota + 1).astype(jnp.int32)
    counts = ends - starts
    cap = min(n, int(np.ceil(n / nb * 2.5)) + 32)
    overflow = jnp.any(counts > cap)

    # sub-chunk the atom axis so the (cap_s, C*order, order^2) out block
    # (tile-padded to cap_s x 8 x 128 per channel-row) stays ~2 MB
    cap_s = min(cap, 512)
    s_chunks = -(-cap // cap_s)
    cap_pad = cap_s * s_chunks

    take = starts[:, None] + jnp.arange(cap_pad, dtype=jnp.int32)[None, :]
    take = jnp.minimum(take, n - 1)
    m_b = base_s[take]
    m_b = m_b.at[..., 0].add(-((b_iota // ny) * wx)[:, None])
    m_b = m_b.at[..., 1].add(-((b_iota % ny) * wy)[:, None])

    # halo-padded cotangent blocks: two overlapping row-takes (sequential
    # HBM traffic), then regroup to one leading block axis
    g_pad = _pad_cotangent(g_mesh, k1 + halo, order)
    ix = (
        (jnp.arange(nx, dtype=jnp.int32) * wx)[:, None]
        + jnp.arange(wx + halo, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    iy = (
        (jnp.arange(ny, dtype=jnp.int32) * wy)[:, None]
        + jnp.arange(wy + _YW, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    blk = jnp.take(g_pad, ix, axis=1)
    blk = jnp.take(blk, iy, axis=2)
    blk = blk.reshape(n_ch, nx, wx + halo, ny, wy + _YW, k3pad)
    blk = blk.transpose(1, 3, 0, 2, 4, 5).reshape(
        nb, n_ch, wx + halo, wy + _YW, k3pad
    )

    counts_s = jnp.clip(
        counts[:, None] - (jnp.arange(s_chunks, dtype=jnp.int32) * cap_s)[None],
        0, cap_s,
    ).reshape(-1)
    m_bs = m_b.reshape(nb * s_chunks, cap_s, 3)
    n_prog = nb * s_chunks
    s_const = np.int32(s_chunks)

    out = pl.pallas_call(
        _make_gather_kernel(order, n_ch),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((n_prog,), lambda p: (_I0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cap_s, 3), lambda p: (p, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, n_ch, wx + halo, wy + _YW, k3pad),
                lambda p: (p // s_const, _I0, _I0, _I0, _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, cap_s, n_ch * order, order * order),
            lambda p: (p, _I0, _I0, _I0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_prog, cap_s, n_ch * order, order * order), g_mesh.dtype
        ),
        interpret=interpret,
    )(counts_s, m_bs, blk)

    g_q = _gather_postprocess(
        out.reshape(nb, cap_pad, n_ch * order, order * order),
        sort_order, take, counts, cap_pad, n, n_ch, order,
    )
    return g_q, overflow


def _pallas_gather_slabs_impl(m_u0, g_mesh, grid_shape, n_slabs,
                              interpret=False, order=6):
    """Adjoint of _pallas_spread_impl (1-D slab decomposition): same contract
    as _pallas_gather2d_impl."""
    k1, k2, k3 = grid_shape
    n = m_u0.shape[0]
    n_ch = g_mesh.shape[0]
    halo = order - 1
    half = order // 2
    width = -(-k1 // n_slabs)
    k2pad = k2 + _YW
    k3pad = k3 + _ZW

    base = jnp.stack(
        [
            jnp.mod(m_u0[:, 0] - half, k1),
            jnp.mod(m_u0[:, 1] - half, k2),
            jnp.mod(m_u0[:, 2] - half, k3),
        ],
        axis=-1,
    ).astype(jnp.int32)
    slab_id = base[:, 0] // width
    sort_order = jnp.argsort(slab_id)
    sorted_ids = slab_id[sort_order]
    base_s = base[sort_order]

    slab_iota = jnp.arange(n_slabs, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_ids, slab_iota).astype(jnp.int32)
    ends = jnp.searchsorted(sorted_ids, slab_iota + 1).astype(jnp.int32)
    counts = ends - starts
    cap = min(n, int(np.ceil(n / n_slabs * 2.5)) + 32)
    overflow = jnp.any(counts > cap)

    cap_s = min(cap, 512)
    s_chunks = -(-cap // cap_s)
    cap_pad = cap_s * s_chunks

    take = starts[:, None] + jnp.arange(cap_pad, dtype=jnp.int32)[None, :]
    take = jnp.minimum(take, n - 1)
    m_b = base_s[take]
    m_b = m_b.at[..., 0].add(-(slab_iota * width)[:, None])

    g_pad = _pad_cotangent(g_mesh, n_slabs * width + halo, order)
    ix = (
        (slab_iota * width)[:, None]
        + jnp.arange(width + halo, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    blk = jnp.take(g_pad, ix, axis=1).reshape(
        n_ch, n_slabs, width + halo, k2pad, k3pad
    ).transpose(1, 0, 2, 3, 4)

    counts_s = jnp.clip(
        counts[:, None] - (jnp.arange(s_chunks, dtype=jnp.int32) * cap_s)[None],
        0, cap_s,
    ).reshape(-1)
    m_bs = m_b.reshape(n_slabs * s_chunks, cap_s, 3)
    n_prog = n_slabs * s_chunks
    s_const = np.int32(s_chunks)

    out = pl.pallas_call(
        _make_gather_kernel(order, n_ch),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((n_prog,), lambda p: (_I0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cap_s, 3), lambda p: (p, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, n_ch, width + halo, k2pad, k3pad),
                lambda p: (p // s_const, _I0, _I0, _I0, _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, cap_s, n_ch * order, order * order),
            lambda p: (p, _I0, _I0, _I0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_prog, cap_s, n_ch * order, order * order), g_mesh.dtype
        ),
        interpret=interpret,
    )(counts_s, m_bs, blk)

    g_q = _gather_postprocess(
        out.reshape(n_slabs, cap_pad, n_ch * order, order * order),
        sort_order, take, counts, cap_pad, n, n_ch, order,
    )
    return g_q, overflow
