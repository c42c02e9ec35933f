#!/usr/bin/env python
"""98k neighbor-list refresh: stage decomposition + compaction A/Bs.

Round-4 VERDICT item 2: the jitted 98k refresh measures 94 ms at 0.2% of
its bytes bound — find where it goes and attack. Stages timed separately:

  candidates   — bin/sort atoms + packed-table row gather + r^2 filter
  stage1(sort) — per-row value sort of the (n, 14*cap) candidate ids
  stage1(topk) — lax.top_k of the k_row smallest ids (A/B)
  stage2       — cumsum offsets + cummax segment expansion + flat gather
  i-sort       — the final (capacity,) argsort restoring i-monotonicity
  FULL refresh — _cell_pairs jitted end-to-end, sort vs topk, sort_i on/off

Writes examples/nlrefresh_98k_tpu.out.
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

    from admp_tpu.ops import neighborlist as NL
    from admp_tpu.systems import water_system

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
    pos = jnp.asarray(s["positions"], jnp.float32)
    box = jnp.asarray(s["box"], jnp.float32)
    n = pos.shape[0]
    cutoff = 4.0
    emit(f"system: {n} atoms, cutoff {cutoff}")

    # allocation (host-side sizing) once; reuse its static shapes
    nl = NL.neighbor_list_cell(np.asarray(pos), np.asarray(box), cutoff)
    n_cells = NL._cell_grid(np.asarray(box), cutoff)
    # recover the static cell_capacity the allocation used
    import math
    counts = None
    # mirror neighbor_list_cell's capacity choice: probe the module
    frac = np.asarray(pos) @ np.linalg.inv(np.asarray(box))
    frac -= np.floor(frac)
    ncx, ncy, ncz = n_cells
    cx = np.minimum((frac[:, 0] * ncx).astype(int), ncx - 1)
    cy = np.minimum((frac[:, 1] * ncy).astype(int), ncy - 1)
    cz = np.minimum((frac[:, 2] * ncz).astype(int), ncz - 1)
    occ = np.bincount((cx * ncy + cy) * ncz + cz, minlength=ncx * ncy * ncz)
    cell_capacity = -(-int(occ.max()) // 8) * 8
    capacity = nl.capacity
    emit(f"cells {n_cells}, cell_capacity {cell_capacity}, "
         f"pair capacity {capacity}, pairs {int(np.sum(np.asarray(nl.pairs)[:,0] < n))}")

    drift = jnp.asarray(
        0.0005 * np.random.default_rng(1).standard_normal((n, 3)), jnp.float32
    )
    n_inner = 3

    def timeit(name, fn):
        @jax.jit
        def loop(p):
            def body(p, _):
                out = fn(p)
                consume = sum(
                    jnp.sum(o.astype(jnp.float32)) * 1e-9
                    for o in jax.tree_util.tree_leaves(out)
                )
                return p + drift + 0.0 * consume, consume
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
        emit(f"{name:44s} {ms:8.2f} ms")
        return ms

    # stages
    def candidates(p):
        good, cand, _i, ovf = NL._cell_candidates(
            p, box, cutoff, n_cells, cell_capacity
        )
        return good, cand

    timeit("candidates (bin+gather+filter)", candidates)

    k_row = NL._ROW_K

    def stage1_sort(p):
        good, cand = candidates(p)
        return jnp.sort(jnp.where(good, cand, n), axis=1)[:, :k_row]

    def stage1_topk(p):
        good, cand = candidates(p)
        neg, _ = jax.lax.top_k(-jnp.where(good, cand, n), k_row)
        return -neg

    timeit("candidates + stage1 row sort", stage1_sort)
    timeit("candidates + stage1 top_k", stage1_topk)

    # per-cell candidate gather (round-5: 14x fewer row-gather ops)
    NL.CAND_METHOD = "cell"
    timeit("candidates, per-CELL table", candidates)
    NL.CAND_METHOD = "atom"

    for cand, method in (("atom", "sort"), ("atom", "topk"),
                         ("cell", "sort")):
        NL.CAND_METHOD = cand
        NL.COMPACT_METHOD = method
        NL._cell_pairs.clear_cache()

        def full_sorted(p):
            pairs, ovf = NL._cell_pairs(
                p, box, cutoff, n_cells, cell_capacity, capacity, True
            )
            return pairs

        def full_unsorted(p):
            pairs, ovf = NL._cell_pairs(
                p, box, cutoff, n_cells, cell_capacity, capacity, False
            )
            return pairs

        timeit(f"FULL refresh ({cand}/{method}, sort_i=True)", full_sorted)
        timeit(f"FULL refresh ({cand}/{method}, sort_i=False)", full_unsorted)
    NL.COMPACT_METHOD = "sort"
    NL.CAND_METHOD = "atom"
    NL._cell_pairs.clear_cache()

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
