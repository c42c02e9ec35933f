#!/usr/bin/env python
"""98k real-space backward decomposition (round-4 VERDICT item 1 groundwork).

The roofline pins real-space e+g at 73 ms (2% of its HBM bound) and names
the j-side scatter transposes as the residual. Before building the
symmetrized-pair formulation, measure where the backward actually goes:

  A  kernel fwd (prebuilt tables)          — pair math only
  B  kernel e+g wrt TABLES (no transposes) — adds the in-kernel vjp
  C  kernel e+g wrt packed (N,F) table     — adds gather transposes:
       C1 i-side sorted segment-sum + j-side random scatter  (production)
       C2 BOTH sides via scatter                              (round-3 state)
       C3 j-side via static-permutation gather + sorted segsum (candidate)
       C4 j-side DROPPED, i-side doubled on a symmetrized 2C list
          (the symmetrized-pair formulation's backward; fwd costs 2x kernel)

  The C3 candidate needs a per-refresh static argsort of j (free at refresh
  cadence); C4 changes the forward too — its row is the full symmetrized
  e+g. Writes examples/realbwd_98k_tpu.out.
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

    from admp_tpu import convert_cart2harm
    from admp_tpu.ops import realspace
    from admp_tpu.ops.frames import construct_local_frames
    from admp_tpu.ops.harmonics import rot_local2global
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.ops.pallas.pairs import pair_perm_energies, table_width
    from admp_tpu.systems import water_system
    from admp_tpu.utils.linalg3 import inv3x3

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    pos = jnp.asarray(s["positions"], jnp.float32)
    box = jnp.asarray(s["box"], jnp.float32)
    n = pos.shape[0]
    nl = neighbor_list_cell(np.asarray(pos), np.asarray(box), 4.0)
    pairs = jnp.asarray(nl.pairs)
    c = pairs.shape[0]
    emit(f"system: {n} atoms, {c} pair capacity (i-sorted={nl.i_sorted})")

    q_local = convert_cart2harm(jnp.asarray(s["q_cart"]), 2).astype(jnp.float32)
    frames = construct_local_frames(
        pos, box, jnp.asarray(s["axis_types"]), jnp.asarray(s["axis_indices"])
    )
    qg = rot_local2global(q_local, frames, 2).astype(jnp.float32)

    i = jnp.minimum(pairs[:, 0], n - 1)
    j = jnp.minimum(pairs[:, 1], n - 1)
    mask = (pairs[:, 0] < pairs[:, 1]).astype(jnp.float32)
    mscale = jnp.ones((c,), jnp.float32)  # exclusions irrelevant to timing
    kappa = jnp.float32(0.6607)
    scal = jnp.concatenate(
        [kappa.reshape(1), box.reshape(9), inv3x3(box).reshape(9)]
    )
    packed = jnp.concatenate([pos, qg], axis=1)
    assert packed.shape[1] == table_width(2, False)
    scl = jnp.stack([mscale, mask])

    g_i0 = jnp.asarray(realspace.take_rows_sorted(packed, i))
    g_j0 = jnp.asarray(packed[j])

    # static j-sorted permutation (per-refresh cost, not per-step)
    perm_j = jnp.asarray(np.argsort(np.asarray(j), kind="stable"), jnp.int32)
    j_sorted = j[perm_j]

    drift = jnp.asarray(
        0.0005 * np.random.default_rng(1).standard_normal((n, 3)), jnp.float32
    )
    n_inner = 3

    def timeit(name, fn_of_pos):
        @jax.jit
        def loop(p):
            def body(p, _):
                out = fn_of_pos(p)
                return p + drift + 0.0 * out, out
            return jax.lax.scan(body, p, None, length=n_inner)

        out = loop(pos)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(pos)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"{name:56s} {ms:8.2f} ms")
        OUT.write_text("\n".join(lines) + "\n")  # survive later crashes
        return ms

    # A: forward only, prebuilt tables (tables drift with p so nothing hoists)
    def fwd(p):
        gi = g_i0.at[:, 0].add(p[0, 0] * 1e-6)
        gj = g_j0.at[:, 0].add(p[0, 0] * 1e-6)
        e = pair_perm_energies(gi, gj, scl, scal, 2)
        return jnp.sum(e)

    timeit("A  kernel fwd (prebuilt tables)", fwd)

    # B: e+g wrt tables, transposes replaced by a sum
    def eg_tables(p):
        def f(gi, gj):
            return jnp.sum(pair_perm_energies(gi, gj, scl, scal, 2))
        gi = g_i0.at[:, 0].add(p[0, 0] * 1e-6)
        gj = g_j0.at[:, 0].add(p[0, 0] * 1e-6)
        e, (ci, cj) = jax.value_and_grad(f, argnums=(0, 1))(gi, gj)
        return e + jnp.sum(ci * ci) + jnp.sum(cj * cj)

    timeit("B  kernel e+g wrt tables (no gather transposes)", eg_tables)

    # C variants: e+g wrt the packed (N, F) table through the gathers
    def make_c(gather_i, gather_j):
        def eg(p):
            def f(tbl):
                gi = gather_i(tbl)
                gj = gather_j(tbl)
                return jnp.sum(pair_perm_energies(gi, gj, scl, scal, 2))
            tbl = packed.at[:, :3].add(p * 1e-6)
            e, ct = jax.value_and_grad(f)(tbl)
            return e + jnp.sum(ct * ct)
        return eg

    timeit(
        "C1 production: i sorted-segsum + j random scatter",
        make_c(lambda t: realspace.take_rows_sorted(t, i), lambda t: t[j]),
    )
    timeit(
        "C2 both sides plain gather (scatter transposes)",
        make_c(lambda t: t[i], lambda t: t[j]),
    )

    # C3: combined-transpose — plain forward gathers; the backward
    # concatenates BOTH cotangent tables (2C, F), permutes them into the
    # order of a STATIC argsort of concat(i, j) (per-refresh cost), and
    # runs ONE sorted segment-sum. Trades the 1.7M-row random scatter for
    # a 3.4M-row random gather + sorted reduce.
    ids12 = np.concatenate([np.asarray(i), np.asarray(j)])
    perm12_np = np.argsort(ids12, kind="stable")
    perm12 = jnp.asarray(perm12_np, jnp.int32)
    keys12 = jnp.asarray(ids12[perm12_np], jnp.int32)

    @jax.custom_vjp
    def gather_both(tbl):
        return tbl[i], tbl[j]

    def gather_both_fwd(tbl):
        return gather_both(tbl), None

    def gather_both_bwd(_res, cts):
        ct_i, ct_j = cts
        big = jnp.concatenate([ct_i, ct_j], axis=0)[perm12]
        acc = jax.ops.segment_sum(
            big, keys12, num_segments=n, indices_are_sorted=True
        )
        return (acc,)

    gather_both.defvjp(gather_both_fwd, gather_both_bwd)

    def eg_c3(p):
        def f(tbl):
            gi, gj = gather_both(tbl)
            return jnp.sum(pair_perm_energies(gi, gj, scl, scal, 2))
        tbl = packed.at[:, :3].add(p * 1e-6)
        e, ct = jax.value_and_grad(f)(tbl)
        return e + jnp.sum(ct * ct)

    timeit("C3 combined 2C-row perm-gather + one sorted segsum", eg_c3)

    # C4: symmetrized 2C-row list — forward over both orientations at half
    # weight; backward only needs slot-1 cotangents (slot-2 equals slot-1 of
    # the mirrored row), both i-sorted. Built here as a straight graph: the
    # fwd is 2x kernel rows; the bwd discards the slot-2 cotangent scatter.
    ii2 = np.concatenate([np.asarray(i), np.asarray(j)])
    jj2 = np.concatenate([np.asarray(j), np.asarray(i)])
    perm2 = np.argsort(ii2, kind="stable")
    i2 = jnp.asarray(ii2[perm2], jnp.int32)
    j2 = jnp.asarray(jj2[perm2], jnp.int32)
    mask2 = jnp.concatenate([mask, mask])[jnp.asarray(perm2)]
    mscale2 = jnp.concatenate([mscale, mscale])[jnp.asarray(perm2)]
    scl2 = jnp.stack([mscale2, mask2])

    def eg_c4(p):
        def f(tbl):
            gi = realspace.take_rows_sorted(tbl, i2)
            gj = jax.lax.stop_gradient(tbl)[j2]
            return 0.5 * jnp.sum(
                pair_perm_energies(gi, gj, scl2, scal, 2)
            ) * 2.0  # slot-1-only cotangent x2 == full gradient
        tbl = packed.at[:, :3].add(p * 1e-6)
        e, ct = jax.value_and_grad(f)(tbl)
        return e * 0.5 + jnp.sum(ct * ct)

    # C4b: lower BOUND for any symmetrized formulation — the kernel e+g
    # alone on 2C rows (no gathers, no transposes). If this already exceeds
    # C1, doubling the rows can never win regardless of transpose savings.
    def eg_tables2(p):
        # 2C tables built IN-GRAPH from the C-row constants: closing over
        # the concatenated 354 MB arrays embeds them in the MLIR payload and
        # the remote-compile tunnel rejects it (HTTP 413)
        def f(gi, gj):
            scl2b = jnp.concatenate([scl, scl], axis=1)
            return jnp.sum(pair_perm_energies(gi, gj, scl2b, scal, 2))
        gi1 = g_i0.at[:, 0].add(p[0, 0] * 1e-6)
        gj1 = g_j0.at[:, 0].add(p[0, 0] * 1e-6)
        gi = jnp.concatenate([gi1, gj1], axis=0)
        gj = jnp.concatenate([gj1, gi1], axis=0)
        e, (ci, cj) = jax.value_and_grad(f, argnums=(0, 1))(gi, gj)
        return e + jnp.sum(ci * ci) + jnp.sum(cj * cj)

    timeit("C4b kernel e+g on 2C rows (symmetrized lower bound)", eg_tables2)

    try:
        timeit("C4 symmetrized 2C rows, slot-1-only backward", eg_c4)
    except Exception as exc:  # noqa: BLE001 - compile-helper crash observed
        emit(f"C4 symmetrized full graph: FAILED ({type(exc).__name__}: "
             f"{str(exc).splitlines()[0][:120]})")

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
