#!/usr/bin/env python
"""Roofline accounting for the 98k-atom fluctuating-multipole step (TPU).

Converts "fast" from a diff-trajectory into an absolute claim (VERDICT r3
item 4): each major stage of the 98304-atom step (K=256 grids, ~1.6M-pair
cell list) is timed in isolation (scan-amortized) and compared against the
machine ceiling that governs it. The ceilings are MEASURED on this chip, not
quoted from spec sheets:

  hbm   — streaming bandwidth from a scan of c <- sqrt(c*c + x*x) over
          ~1 GiB f32 arrays (3 passes/iter; the non-affine body defeats
          the algebraic collapse that made y = x + 1 "time" at 64 TB/s)
  vpu   — f32 elementwise throughput from a scan of chained c <- c*c + x
  mxu   — f32 (HIGHEST precision) matmul throughput from a chained
          c <- c @ a / ||.|| scan at 4096^2

Ceiling-timing methodology (hard-won on this tunnel): block_until_ready
does NOT reliably synchronize small single-fusion programs through the
remote-execute path (a full 1 GiB copy "timed" 0.02 ms), while large
scan-wrapped workloads — every stage/bench measurement in this repo —
time correctly and reproduce independently-verified numbers. The ceilings
therefore sync on a HOST TRANSFER (float(out)) and subtract the measured
~30 ms dispatch/roundtrip floor (CLAUDE.md), with workloads sized well
above it.

For each stage we state the dominant resource, the minimum traffic/work the
CURRENT ALGORITHM must move/do (algorithm bound), the ideal-algorithm
minimum where it differs (e.g. the row-gather adjoint overfetches 42x by
design), and the achieved fraction of the algorithm bound. Stages under 50%
carry a named next lever. Writes examples/roofline_98k_tpu.out.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).with_suffix(".out")


def main():
    import jax
    import jax.numpy as jnp

    from admp_tpu import ADMPPmeForce, convert_cart2harm
    from admp_tpu.ops import reciprocal as R
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import rot_local2global
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.settings import EngineConfig
    from admp_tpu.systems import water_system

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    dev = jax.devices()[0]
    emit(f"device: {dev.device_kind} ({dev.platform})")

    # ---------------- measured machine ceilings ----------------
    def med_time(fn, arg, n=5):
        out = fn(arg)
        jax.block_until_ready(out)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(arg)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def med_host(fn, *args, n=3):
        float(fn(*args))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # dispatch/roundtrip floor: a trivial jit, host-synced
    tiny = jnp.ones((8,), jnp.float32)
    floor_s = med_host(jax.jit(lambda t: jnp.sum(t)), tiny)
    emit(f"dispatch/roundtrip floor: {floor_s * 1e3:.1f} ms "
         f"(subtracted from ceiling timings)")

    n_stream = 1 << 28  # 1 GiB f32
    n_iter_s = 16
    rng0 = np.random.default_rng(0)
    x_big = jnp.asarray(
        rng0.standard_normal(n_stream).astype(np.float32)
    )

    @jax.jit
    def stream(x):
        def body(c, _):
            return jnp.sqrt(c * c + x * x), 0.0  # non-affine: no collapse
        c, _ = jax.lax.scan(
            body, jnp.zeros_like(x), None, length=n_iter_s
        )
        return jnp.sum(c)

    t = max(med_host(stream, x_big) - floor_s, 1e-6)
    # per iteration: read c + read x + write c = 3 passes
    hbm_bw = 3 * n_stream * 4 * n_iter_s / t
    emit(f"measured HBM stream bandwidth: {hbm_bw / 1e9:.0f} GB/s "
         f"(scan of c <- sqrt(c^2 + x^2), 3 passes/iter)")

    n_v = 1 << 25
    n_iter_v = 128

    @jax.jit
    def vpu_chain(x):
        def body(c, _):
            for _ in range(8):
                c = c * c + x  # non-affine: no algebraic collapse
            return c, 0.0
        c, _ = jax.lax.scan(body, x, None, length=n_iter_v)
        return jnp.sum(c)

    x_v = jnp.full((n_v,), 1e-4, jnp.float32)
    t = max(med_host(vpu_chain, x_v) - floor_s, 1e-6)
    vpu_ops = n_v * 8 * n_iter_v * 2 / t  # FMA = 2 flops
    emit(f"measured VPU f32 dependent-chain: {vpu_ops / 1e12:.2f} Tflop/s "
         "(back-to-back FMAs — a LATENCY rate, the regime a serial "
         "per-atom kernel loop runs in)")

    @jax.jit
    def vpu_chain4(x):
        def body(cs, _):
            a, b, c, d = cs
            for _ in range(8):
                a = a * a + x
                b = b * b + x
                c = c * c + x
                d = d * d + x
            return (a, b, c, d), 0.0
        cs, _ = jax.lax.scan(
            body, (x, x + 1e-6, x + 2e-6, x + 3e-6), None, length=n_iter_v
        )
        return jnp.sum(cs[0]) + jnp.sum(cs[1]) + jnp.sum(cs[2]) + jnp.sum(
            cs[3])

    t = max(med_host(vpu_chain4, x_v) - floor_s, 1e-6)
    vpu_ops4 = 4 * n_v * 8 * n_iter_v * 2 / t
    emit(f"measured VPU f32 4-way ILP: {vpu_ops4 / 1e12:.2f} Tflop/s "
         "(a LOWER bound on the throughput ceiling: operands are HBM-resident here, unlike the kernel's VMEM tiles)")

    m = 4096
    n_iter_m = 16
    a_mm = jnp.asarray(
        rng0.standard_normal((m, m)).astype(np.float32) / np.sqrt(m)
    )

    @jax.jit
    def mm(a):
        def body(c, _):
            c = jax.lax.dot(c, a, precision=jax.lax.Precision.HIGHEST)
            return c / jnp.max(jnp.abs(c)), 0.0
        c, _ = jax.lax.scan(body, a, None, length=n_iter_m)
        return jnp.sum(c)

    t = max(med_host(mm, a_mm) - floor_s, 1e-6)
    mxu_ops = 2 * m ** 3 * n_iter_m / t
    emit(f"measured MXU f32(HIGHEST) matmul: {mxu_ops / 1e12:.1f} Tflop/s")
    if not (1e11 < hbm_bw < 3e12):
        emit(f"!! HBM ceiling implausible ({hbm_bw:.3g} B/s) — treat "
             "fractions below as suspect")

    # ---------------- 98k workload ----------------
    s = water_system(n_side=32, spacing=3.104, jitter=0.12, seed=0)
    n = s["positions"].shape[0]
    positions = jnp.asarray(s["positions"], jnp.float32)
    box = jnp.asarray(s["box"], jnp.float32)
    rc = 4.0
    grid = (256, 256, 256)
    kcube = grid[0] * grid[1] * grid[2]
    emit(f"system: {n} atoms, grid {grid}, rc {rc}")

    nl = neighbor_list_cell(positions, box, rc)
    pairs = jnp.asarray(nl.pairs)
    n_pairs = int(pairs.shape[0])
    emit(f"pair capacity: {n_pairs}")

    q_local = convert_cart2harm(jnp.asarray(s["q_cart"]), 2).astype(
        jnp.float32
    )
    frames = construct_local_frames(
        positions, box, jnp.asarray(s["axis_types"]),
        jnp.asarray(s["axis_indices"]),
    )
    qg = rot_local2global(q_local, frames, 2)
    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)), jnp.float32)

    n_inner = 3

    def timeit_scan(fn_of_pos, pos):
        @jax.jit
        def loop(p):
            def body(p, _):
                out = fn_of_pos(p)
                return p + drift + 0.0 * out, 0.0
            return jax.lax.scan(body, p, None, length=n_inner)

        out = loop(pos)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(pos)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) / n_inner * 1e3)

    def report(name, ms, bound_ms, resource, ideal_ms=None, lever=None):
        frac = bound_ms / ms if ms > 0 else 0.0
        msg = (f"{name:34s} {ms:8.2f} ms | {resource} algo-bound "
               f"{bound_ms:7.2f} ms -> {100 * frac:5.1f}% of bound")
        if ideal_ms is not None:
            msg += f" | ideal-algo {ideal_ms:.2f} ms"
        emit(msg)
        if frac < 0.5 and lever:
            emit(f"{'':34s} next lever: {lever}")

    stencil = 216  # order^3

    # --- forward spread ---
    def spread_fwd(p):
        mesh = R.spread_to_mesh(p, box, qg, grid, 2, method="auto")
        return jnp.sum(mesh) * 1e-6

    ms = timeit_scan(spread_fwd, positions)
    # HBM: read atom payload (~16 f32) + write mesh + DMA the sorted stencil
    # table twice (built to HBM, DMA'd back)
    bytes_hbm = (n * 16 * 4) + kcube * 4 + 2 * n * stencil * 4
    # VPU: the one-hot z-combine + placement adds: per atom, order^2 select-
    # FMA passes over (order, _ZW=256) plus the roll and windowed adds —
    # ~5e5 element-ops (estimate from the kernel structure,
    # ops/pallas/spread.py). The honest ceiling is BRACKETED: the kernel's
    # per-atom fori_loop serializes on small dependent ops (the
    # dependent-chain VPU rate), while perfect ILP would run at the 4-way
    # rate. Measured time landing at ~the dependent-chain bound — and the
    # wide-FMA + MXU combine A/Bs both failing to move it
    # (examples/spreadwide/spreadmxu artifacts) — says the kernel is
    # ISSUE-LATENCY bound, not throughput bound: the lever is fewer
    # serialized ops per atom (e.g. batching atoms per window), not wider
    # ones.
    vpu_ops_stage = n * 5e5
    bound_chain = max(bytes_hbm / hbm_bw, vpu_ops_stage / vpu_ops) * 1e3
    bound_ilp = max(bytes_hbm / hbm_bw, vpu_ops_stage / vpu_ops4) * 1e3
    emit(f"forward spread bound bracket: {bound_ilp:.2f} ms (full-ILP VPU) "
         f".. {bound_chain:.2f} ms (dependent-chain VPU)")
    report(
        "forward spread (Pallas 2-D)", ms, bound_chain, "VPU(chain)",
        ideal_ms=bound_ilp,
        lever="reduce SERIALIZED per-atom op count (batch atoms per "
              "window); wider/MXU combines measured neutral/negative",
    )

    # --- spread adjoint (gather) ---
    def spread_adj(p):
        def f(pp):
            mesh = R.spread_to_mesh(pp, box, qg, grid, 2, method="auto")
            return jnp.sum(mesh * mesh)
        return jax.grad(f)(p)

    ms_adj = timeit_scan(spread_adj, positions) - ms  # subtract forward
    # the row-gather adjoint reads 36 full K3-rows per atom
    bytes_rows = n * 6 * 6 * grid[2] * 4 + kcube * 4
    bound_adj = bytes_rows / hbm_bw * 1e3
    report(
        "spread adjoint (row-gather)", ms_adj, bound_adj, "HBM",
        ideal_ms=(n * stencil * 4 * 2) / hbm_bw * 1e3,
        lever="the pass is per-ROW-op bound (~10-14 ns/row), not "
              "bytes-bound; macro-row slices measured 12-20x SLOWER "
              "(examples/rowmacro_98k_tpu.out) — no known next step on "
              "this hardware's gather path",
    )

    # --- FFT + influence (fixed mesh) ---
    mesh_fixed = R.spread_to_mesh(positions, box, qg, grid, 2, method="auto")
    from admp_tpu.ops.ewald import setup_ewald_parameters
    from admp_tpu.ops.influence import ck_1

    kappa = float(setup_ewald_parameters(rc, 1e-4, box)[0])

    def fft_conv(mesh_in):
        from admp_tpu.ops.reciprocal import convolve_energy

        return convolve_energy(mesh_in, box, kappa, ck_1, False, 1.0)

    @jax.jit
    def fft_loop(m0):
        def body(c, _):
            e = fft_conv(c)
            return c + 0.0 * e, e
        return jax.lax.scan(body, m0, None, length=n_inner)

    out = fft_loop(mesh_fixed)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fft_loop(mesh_fixed)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ms_fft = float(np.median(ts) / n_inner * 1e3)
    # rfft over 3 axes: ~3 passes over the (complex half) spectrum + the
    # first real pass; count 4 mesh-sized read+write pairs + influence pass
    bytes_fft = 4 * 2 * kcube * 4 + 2 * kcube * 4
    report(
        "FFT + influence (energy)", ms_fft, bytes_fft / hbm_bw * 1e3, "HBM",
        lever="fused rfft passes are XLA's; only fewer/smaller grids help",
    )

    # --- real-space pair pass (direct, as examples/pairsort_98k_tpu.py) ---
    from admp_tpu.models.pme import pme_real_energy
    from admp_tpu.ops.exclusions import build_sparse_exclusions

    nmol = n // 3
    bonds = [(3 * m_, 3 * m_ + h) for m_ in range(nmol) for h in (1, 2)]
    exclusions = build_sparse_exclusions(bonds, n, max_depth=6)
    from admp_tpu.ops.ewald import setup_ewald_parameters as _sep

    kappa_r = float(_sep(rc, 1e-4, box)[0])
    axis_types_j = jnp.asarray(s["axis_types"])
    axis_indices_j = jnp.asarray(s["axis_indices"])
    m_scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0], jnp.float32)

    def real_eg(p):
        def f(pp):
            fr = construct_local_frames(pp, box, axis_types_j, axis_indices_j)
            qgl = rot_local2global(q_local, fr, 2)
            return pme_real_energy(
                pp, box, pairs, qgl, None, None, None, m_scales, None,
                exclusions, kappa_r, 2, False, pair_chunk=None,
                pairs_i_sorted=True,
            )
        return jax.grad(f)(p)

    ms_real = timeit_scan(real_eg, positions)
    # pair pass traffic: 2 row-gathers of the (N, F~24) SoA table per side
    # forward + the i-sorted segment-sum + j-scatter transposes backward:
    # ~6 passes over the (C, F) pair-row tables
    f_cols = 24
    bytes_real = 6 * n_pairs * f_cols * 4
    report(
        "real space e+g (incl frames)", ms_real,
        bytes_real / hbm_bw * 1e3, "HBM",
        lever="j-side scatter transposes remain per-row RMW; fused pair "
              "kernel already carries the math (ops/pallas/pairs.py)",
    )

    # --- neighbor-list refresh (jitted fixed-capacity cell rebuild) ---
    from admp_tpu.ops.neighborlist import _cell_pairs

    n_cells = tuple(nl.n_cells)
    cell_cap = int(nl.cell_capacity)

    @jax.jit
    def nl_loop(p):
        def body(c, _):
            new_pairs, _ovf = _cell_pairs(
                c + drift, box, rc, n_cells, cell_cap, nl.capacity,
                sort_i=True,
            )
            return c + drift + 0.0 * jnp.float32(new_pairs[0, 0]), 0.0
        return jax.lax.scan(body, p, None, length=n_inner)

    try:
        out = nl_loop(positions)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = nl_loop(positions)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms_nl = float(np.median(ts) / n_inner * 1e3)
        # candidate table read + pair list write, ~18M half-stencil
        # candidates of (i, j) int32 each
        bytes_nl = 18e6 * 8 + n_pairs * 8
        report("NL refresh (jitted)", ms_nl, bytes_nl / hbm_bw * 1e3,
               "HBM",
               lever="candidate compaction (per-row sort + cummax segment "
                     "expansion) dominates; candidates scale with cell "
                     "stencil volume")
    except Exception as exc:  # pragma: no cover
        emit(f"NL refresh timing skipped: {exc!r}")

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
