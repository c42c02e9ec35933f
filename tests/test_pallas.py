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
    out, overflow = spread_to_mesh_pallas(m_u0, q, (k, k, k), n_slabs=slabs, interpret=True)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_spread_blocks_custom_vjp_matches_scatter():
    import jax

    from admp_tpu.ops.harmonics import convert_cart2harm
    from admp_tpu.ops.reciprocal import spread_to_mesh
    from admp_tpu.systems import water_system

    if not pallas_spread_available():
        pytest.skip("pallas unavailable")
    s = water_system(n_side=3, seed=9)
    pos = jnp.asarray(s["positions"], jnp.float32)
    box = jnp.asarray(s["box"], jnp.float32)
    q = convert_cart2harm(jnp.asarray(s["q_cart"], jnp.float32), 2)
    a = spread_to_mesh(pos, box, q, (24, 24, 24), 2)
    b = spread_to_mesh(pos, box, q, (24, 24, 24), 2, method="pallas",
                       interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
    ga = jax.grad(
        lambda p: jnp.sum(spread_to_mesh(p, box, q, (24, 24, 24), 2) ** 2)
    )(pos)
    gb = jax.grad(
        lambda p: jnp.sum(
            spread_to_mesh(p, box, q, (24, 24, 24), 2, method="pallas",
                           interpret=True) ** 2
        )
    )(pos)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), atol=2e-5)


@pytest.mark.slow
def test_multi_channel_spread_matches_scatter_interpret():
    """Channel-stacked slab kernel (dispersion C6/C8/C10) == the XLA
    multi-channel scatter, values and position-gradients, for both stencil
    orders (interpreter mode on CPU)."""
    import jax
    import numpy as np

    from admp_tpu.ops import reciprocal as R

    rng = np.random.default_rng(0)
    n = 200
    box = jnp.eye(3) * 12.0
    pos = jnp.asarray(rng.uniform(0, 12.0, (n, 3)), jnp.float32)
    coeffs = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    grid = (24, 24, 24)
    for order in (4, 6):
        ref = R.spread_to_mesh_multi(pos, box, coeffs, grid, order)
        got = R.spread_to_mesh_multi(
            pos, box, coeffs, grid, order, method="pallas", interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5
        )
        g_ref = jax.grad(
            lambda p: jnp.sum(
                R.spread_to_mesh_multi(p, box, coeffs, grid, order) ** 2
            )
        )(pos)
        g_got = jax.grad(
            lambda p: jnp.sum(
                R.spread_to_mesh_multi(
                    p, box, coeffs, grid, order, method="pallas",
                    interpret=True,
                ) ** 2
            )
        )(pos)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), atol=1e-4
        )


def test_spread_blocks_2d_matches_scatter_interpret():
    """2-D (x, y)-blocked kernel (the K=320-class path) == XLA scatter, value
    and flat-gather adjoint, in the Pallas interpreter."""
    import jax

    from admp_tpu.ops.pallas.spread import (
        _xla_scatter,
        spread_blocks_2d,
    )

    rng = np.random.default_rng(7)
    k = 32
    n = 160
    grid = (k, k, k)
    m_u0 = jnp.asarray(rng.integers(0, k, size=(n, 3)), jnp.int32)
    q = jnp.asarray(rng.normal(size=(n, 6, 6, 6)), jnp.float32)

    ref = _xla_scatter(m_u0, q, grid)
    got = spread_blocks_2d(m_u0, q, grid, 4, 4, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    g_ref = jax.grad(lambda qq: jnp.sum(_xla_scatter(m_u0, qq, grid) ** 2))(q)
    g_got = jax.grad(
        lambda qq: jnp.sum(spread_blocks_2d(m_u0, qq, grid, 4, 4, True) ** 2)
    )(q)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=2e-3)


def test_auto_dispatch_block_configs_at_scale():
    """Host-side 'auto' resolution invariants (no TPU needed): the 1-D slab
    kernel budget must reject the 98k/K=320 workload (its atom input block
    alone exceeds VMEM — ADVICE round 2) while the 2-D (x,y)-blocked kernel
    accepts it; water_1024-class K=128 stays on the 1-D kernel."""
    from admp_tpu.ops.pallas.spread import pick_blocks_2d
    from admp_tpu.ops.reciprocal import _pallas_spread_slabs

    # pick_blocks_2d / _pallas_spread_slabs are pure host functions of the
    # shapes; only the backend gate needs bypassing for the slab helper
    assert pick_blocks_2d((320, 320, 320), 6, 1, 98304) is not None
    # dispersion-style 3-channel order-4 at K=320: the CAP_FACTOR=1.25
    # input block fits where the old 2.5x cap did not (the budget counts
    # cap-dependent input bytes, so eligibility widens as the cap tightens)
    assert pick_blocks_2d((320, 320, 320), 4, 3, 98304) is not None
    # K=128/3072 fits the 1-D slab budget including the atom input block
    # (bypass the backend gate to exercise the arithmetic on CPU)
    import admp_tpu.ops.reciprocal as R

    orig = R._pallas_backend_ok
    R._pallas_backend_ok = lambda dtype: True
    try:
        assert R._pallas_spread_slabs((128, 128, 128), jnp.float32, 6,
                                      1, 3072) is not None
        assert R._pallas_spread_slabs((320, 320, 320), jnp.float32, 6,
                                      1, 98304) is None
    finally:
        R._pallas_backend_ok = orig


def test_windowed_gather_adjoint_matches_flat_gather_interpret():
    """The Pallas windowed-gather adjoint (spread backward) must equal the
    flat XLA gather exactly — same values, different access pattern (the
    flat gather is per-element bound on TPU: examples/gather_98k_tpu.out).
    Covers 1-D slab + 2-D block decompositions, single/multi channel,
    order 6/4, and a grid smaller than the aligned window (multi-wrap)."""
    from admp_tpu.ops.pallas import spread as sp

    rng = np.random.default_rng(5)
    cases = [
        ("2d", (64, 32, 32), dict(nx=8, ny=4), 1, 6),
        ("2d", (32, 32, 32), dict(nx=4, ny=2), 1, 6),  # k3 < _ZW: multi-wrap
        ("1d", (128, 64, 64), dict(n_slabs=8), 1, 6),
        ("1d", (32, 32, 32), dict(n_slabs=4), 3, 4),   # dispersion-style
    ]
    for kind, grid, kw, n_ch, order in cases:
        n = 700
        m_u0 = jnp.asarray(
            rng.integers(0, grid, size=(n, 3)), dtype=jnp.int32
        )
        g_mesh = jnp.asarray(
            rng.standard_normal((n_ch,) + grid), dtype=jnp.float32
        )
        want = np.asarray(sp._flat_gather(m_u0, g_mesh, grid, order))
        if kind == "2d":
            got, ovf = sp._pallas_gather2d_impl(
                m_u0, g_mesh, grid, kw["nx"], kw["ny"], interpret=True,
                order=order,
            )
        else:
            got, ovf = sp._pallas_gather_slabs_impl(
                m_u0, g_mesh, grid, kw["n_slabs"], interpret=True,
                order=order,
            )
        assert not bool(ovf)
        np.testing.assert_array_equal(
            np.asarray(got).reshape(want.shape), want,
            err_msg=f"{kind} {grid} C={n_ch} order={order}",
        )


def test_second_order_differentiation_through_spread_and_gather():
    """The polarizable implicit adjoint (scf/solver.py solve_bwd) takes
    jax.vjp of a field function whose primal already CONTAINS the spread
    adjoint (an inner jax.grad puts the gather kernel in the forward graph).
    The gathers must therefore be differentiable themselves; a raw
    pallas_call dies at trace time ('assert env.grid_context is not None').
    Checks slab and 2-D variants against the all-XLA scatter second order."""
    import jax

    from admp_tpu.ops.pallas.spread import spread_blocks, spread_blocks_2d

    if not pallas_spread_available():
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(3)
    n, k = 200, 32
    m_u0 = jnp.asarray(rng.integers(0, k, (n, 3)), jnp.int32)
    q0 = jnp.asarray(rng.normal(size=(n, 6, 6, 6)).astype(np.float32))

    def xla_spread(q):
        off = jnp.arange(-3, 3)
        i1 = jnp.mod(m_u0[:, 0:1] + off[None], k)
        i2 = jnp.mod(m_u0[:, 1:2] + off[None], k)
        i3 = jnp.mod(m_u0[:, 2:3] + off[None], k)
        return (
            jnp.zeros((k, k, k), jnp.float32)
            .at[i1[:, :, None, None], i2[:, None, :, None],
                i3[:, None, None, :]]
            .add(q)
        )

    def make_loss(spread):
        def field(q):  # gather appears in the PRIMAL graph via inner grad
            mesh = spread(q0)
            return jax.grad(lambda qq: jnp.sum(spread(qq) * mesh))(q)

        @jax.custom_vjp
        def solve(q):
            return field(q)

        def fwd(q):
            return field(q), q

        def bwd(q, g):  # differentiates the gather -> needs its custom_vjp
            _, vjp_fn = jax.vjp(field, q)
            return vjp_fn(g)

        solve.defvjp(fwd, bwd)
        return lambda q: jnp.sum(solve(q) ** 2)

    _, g_ref = jax.value_and_grad(make_loss(xla_spread))(q0)
    for spread in (
        lambda q: spread_blocks(m_u0, q, (k, k, k), 4, True),
        lambda q: spread_blocks_2d(m_u0, q, (k, k, k), 2, 2, True),
    ):
        val, g = jax.value_and_grad(make_loss(spread))(q0)
        assert np.isfinite(float(val))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-2
        )


def test_row_gather_matches_flat_gather():
    """Lane-aligned grids (K3 % 128 == 0) dispatch gather_blocks(_2d) to the
    pure-XLA row-gather adjoint (full (dx, dy) mesh rows + one-hot z
    extraction — examples/gatherrow_98k_tpu.out: 50.6 vs 86.3 ms at
    98k/K=256). It must be bitwise-equal to the flat per-element gather,
    single and multi channel, including the >4 GB chunked path (forced via
    a monkeypatched threshold)."""
    from admp_tpu.ops.pallas import spread as sp

    rng = np.random.default_rng(7)
    for n_ch, order in ((1, 6), (3, 4)):
        grid = (16, 12, 128)
        n = 500
        m_u0 = jnp.asarray(
            rng.integers(0, grid, size=(n, 3)), dtype=jnp.int32
        )
        g_mesh = jnp.asarray(
            rng.standard_normal((n_ch,) + grid), dtype=jnp.float32
        )
        assert sp._row_gather_eligible(grid)
        want = np.asarray(
            sp._flat_gather(m_u0, g_mesh, grid, order)
        ).reshape(n, n_ch, order ** 3)
        got = sp._row_gather_impl(m_u0, g_mesh, grid, order)
        np.testing.assert_array_equal(np.asarray(got), want)
        # the public entry points dispatch to it on aligned grids
        via_1d = sp.gather_blocks(m_u0, g_mesh, grid, order, 4, True)
        via_2d = sp.gather_blocks_2d(m_u0, g_mesh, grid, order, 2, 2, True)
        np.testing.assert_array_equal(np.asarray(via_1d), want)
        np.testing.assert_array_equal(np.asarray(via_2d), want)


def test_row_gather_chunked_path_matches():
    """Force the chunked row-gather branch by shrinking the byte threshold."""
    from unittest import mock

    import jax

    from admp_tpu.ops.pallas import spread as sp

    rng = np.random.default_rng(8)
    grid = (8, 8, 128)
    n = 600
    m_u0 = jnp.asarray(rng.integers(0, grid, size=(n, 3)), dtype=jnp.int32)
    g_mesh = jnp.asarray(
        rng.standard_normal((1,) + grid), dtype=jnp.float32
    )
    want = np.asarray(sp._row_gather_impl(m_u0, g_mesh, grid, 6))

    real_map = jax.lax.map
    calls = []

    def spy_map(f, xs):
        calls.append(1)
        return real_map(f, xs)

    with mock.patch.object(sp.jax.lax, "map", side_effect=spy_map), \
         mock.patch.object(sp, "_ROW_GATHER_UNCHUNKED_BYTES", 1 << 10):
        got = np.asarray(sp._row_gather_impl(m_u0, g_mesh, grid, 6))
    assert calls, "chunked branch not taken"
    np.testing.assert_array_equal(got, want)


def test_bucket_cap_covers_bench_geometries():
    """Guard against silent overflow -> scatter-fallback at every bench
    geometry (round-3 bisected regression: a 1.25x-mean-only cap overflowed
    at 3000 atoms / 16 slabs — max occupancy 295 vs mean 187.5, molecular
    structure aliasing far beyond Poisson — and the overflow lax.cond sent
    every spread in the pol bench to the XLA scatter, 17.3 -> 28.7 ms).
    Occupancies are computed on the REAL bench boxes; any _bucket_cap or
    CAP_FACTOR change must keep cap >= max occupancy here."""
    from admp_tpu.ops.pallas import spread as sp
    from admp_tpu.systems import water_system

    # (system kwargs, grids exercised by bench.py / the 98k drivers)
    cases = [
        (dict(n_side=10, spacing=3.104, jitter=0.12, seed=0),
         [(96, 96, 128), (48, 48, 128)]),          # pol bench + matvec mesh
        (dict(n_side=8, spacing=3.9, jitter=0.1, seed=0),
         [(128, 128, 128)]),                       # water_1024-class
    ]
    for kwargs, grids in cases:
        s = water_system(**kwargs)
        pos = np.asarray(s["positions"])
        box = np.asarray(s["box"])
        n = pos.shape[0]
        frac = (pos @ np.linalg.inv(box)) % 1.0
        for grid in grids:
            m_u0 = jnp.asarray(
                np.floor(frac * np.asarray(grid)).astype(np.int32)
            )
            # 16 is the first (and, at these grid sizes, chosen) rung of
            # reciprocal._pallas_spread_slabs' ladder; deeper rungs (32/64)
            # only engage for much larger accumulators where means are big
            # enough that the sqrt margin dominates anyway
            for nb in (8, 16):
                bid = np.asarray(sp.slab_bucket_id(m_u0, grid, nb))
                cap = sp._bucket_cap(n, nb)
                occ = int(np.bincount(bid, minlength=nb).max())
                assert occ <= cap, (kwargs, grid, nb, occ, cap)
            blocks = sp.pick_blocks_2d(grid, 6, 1, n)
            if blocks is not None:
                nx, ny = blocks
                bid = np.asarray(sp.bucket_id_2d(m_u0, grid, nx, ny))
                cap = sp._bucket_cap(n, nx * ny)
                occ = int(np.bincount(bid, minlength=nx * ny).max())
                assert occ <= cap, (kwargs, grid, (nx, ny), occ, cap)


def test_spread_interleave_matches_single_interpret(monkeypatch):
    """interleave=2 (a PAIR of atoms per kernel iteration — the round-4
    latency-filling win on the 2-D kernel, examples/spreadilv_98k_tpu.out)
    must be BITWISE-equal to interleave=1: same per-atom math, same slab
    accumulation order. Odd count exercises the one-atom tail region."""
    if not pallas_spread_available():
        pytest.skip("pallas unavailable")
    from admp_tpu.ops.pallas import spread as sp

    rng = np.random.default_rng(3)
    k, n = 32, 401
    m_u0 = jnp.asarray(rng.integers(0, k, (n, 3)), jnp.int32)
    q1 = jnp.asarray(rng.normal(size=(n, 1, 216)).astype(np.float32))
    q3 = jnp.asarray(rng.normal(size=(n, 3, 216)).astype(np.float32))

    outs = {}
    for ilv in (1, 2):
        monkeypatch.setattr(sp, "SPREAD_INTERLEAVE_1D", ilv)
        outs[ilv] = np.asarray(sp._pallas_spread_impl.__wrapped__(
            m_u0, q1, (k, k, k), 4, interpret=True)[0])
    np.testing.assert_array_equal(outs[1], outs[2])

    outs = {}
    for ilv in (1, 2):
        monkeypatch.setattr(sp, "SPREAD_INTERLEAVE_2D", ilv)
        outs[ilv] = np.asarray(sp._pallas_spread2d_impl.__wrapped__(
            m_u0, q3, (k, k, k), 2, 2, interpret=True)[0])
    np.testing.assert_array_equal(outs[1], outs[2])


def test_spread_interleave_groups_bitwise_equal():
    """The generalized g-way atom interleave (round-4 VERDICT item 7: try
    3/4 on the 2-D path) must be bitwise-equal to the serial kernel for
    every group size, including the partial-tail regions."""
    from admp_tpu.ops.pallas import spread as sp

    rng = np.random.default_rng(3)
    K = 32
    for n in (7, 64, 301):  # exercise every tail remainder class
        m_u0 = jnp.asarray(rng.integers(3, K - 3, (n, 3)), jnp.int32)
        q = jnp.asarray(
            rng.standard_normal((n, 6, 6, 6)), jnp.float32
        )
        ref = None
        old = sp.SPREAD_INTERLEAVE_1D
        try:
            for ilv in (1, 2, 3, 4):
                sp.SPREAD_INTERLEAVE_1D = ilv
                mesh, ovf = sp.spread_to_mesh_pallas(
                    m_u0, q, (K, K, K), n_slabs=4, interpret=True
                )
                assert not bool(ovf)
                if ref is None:
                    ref = mesh
                else:
                    assert float(jnp.max(jnp.abs(mesh - ref))) == 0.0
        finally:
            sp.SPREAD_INTERLEAVE_1D = old
