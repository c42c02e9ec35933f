#!/usr/bin/env python
"""Dispatch-floor isolation for the bench harness (TPU via remote tunnel).

Each jitted loop call pays a fixed host->device dispatch latency through the
remote-compile tunnel (~30 ms class, CLAUDE.md); bench.py divides by
n_inner=10, so every reported per-step number may carry a ~3 ms additive
inflation that a production MD run (thousands of scan steps per dispatch)
does not pay. Measures: (a) an empty scan loop's per-call cost, (b) the
bench polarizable step at n_inner = 10 / 30 / 100 — if the per-step time
falls as 1/n_inner toward an asymptote, the asymptote is the honest compute
cost. Writes examples/dispatch_floor_tpu.out.
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

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    # (a) pure dispatch floor: a trivial jitted call
    @jax.jit
    def trivial(x):
        return x + 1.0

    x = jnp.zeros((8, 128))
    jax.block_until_ready(trivial(x))
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(trivial(x))
        ts.append(time.perf_counter() - t0)
    emit(f"trivial jit call (dispatch floor): median "
         f"{np.median(ts)*1e3:.2f} ms, min {np.min(ts)*1e3:.2f} ms")

    # (b) the bench pol workload vs n_inner
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import bench

    for n_inner in (10, 30, 100):
        step, args, _ = bench.build_pol_workload()
        # rebuild the scan with the requested length by re-jitting around
        # the same per-step body is intrusive; instead call the built
        # multi_step (length 10) repeatedly vs a longer wrapper
        if n_inner == 10:
            ms = bench.time_workload(step, args, 10)
            emit(f"pol step, n_inner=10 (bench as-is)       {ms:7.2f} ms")
            continue
        # wrap the length-10 scan in an outer scan of n_inner//10 calls:
        # same compute per step, 1 dispatch per (n_inner) steps
        reps = n_inner // 10

        @jax.jit
        def outer(pos, u):
            def body(c, _):
                p, uu = c
                p2, u2, es = step._fun(p, uu) if hasattr(step, "_fun") else \
                    step(p, uu)
                return (p2, u2), es[-1]
            return jax.lax.scan(body, (pos, u), None, length=reps)

        out = outer(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = outer(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) / n_inner * 1e3)
        emit(f"pol step, n_inner={n_inner:<4d}                  {ms:7.2f} ms")

    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
