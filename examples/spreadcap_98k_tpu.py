#!/usr/bin/env python
"""Bucket-capacity factor ladder for the Pallas spread at 98k/K=256 (TPU).

The (nb, cap) window take that feeds the spread kernels moves
CAP_FACTOR x the atom stencil table through HBM (spreadfwd_98k_tpu.out:
bucketing is ~46 of the 51 ms forward); liquid-density buckets of ~1000
atoms fluctuate only a few percent around the mean, so the conservative
2.5x cap is mostly overfetch. This ladders CAP_FACTOR over the full
forward spread and the spread e+g (fwd + gather adjoint), one subprocess
per factor (the impls are jitted with the factor baked in). Overflow
falls back to the XLA scatter, so correctness is unaffected; the probe
also reports the max bucket occupancy / mean ratio actually observed.
Writes examples/spreadcap_98k_tpu.out.
"""

import pathlib
import subprocess
import sys

OUT = pathlib.Path(__file__).with_suffix(".out")

CHILD = r"""
import sys, time
import numpy as np

sys.path.insert(0, {repo!r})

factor = float(sys.argv[1])

import admp_tpu.ops.pallas.spread as sp
sp.CAP_FACTOR = factor

import jax
import jax.numpy as jnp

from admp_tpu import convert_cart2harm
from admp_tpu.ops.frames import construct_local_frames
from admp_tpu.ops.harmonics import rot_local2global
from admp_tpu.ops import reciprocal as R
from admp_tpu.systems import water_system

grid = (256, 256, 256)
s = water_system(n_side=32, spacing=3.104, jitter=0.1, seed=0)
n = s["positions"].shape[0]
box = jnp.asarray(s["box"], dtype=jnp.float32)
pos = jnp.asarray(s["positions"], dtype=jnp.float32)
q_local = convert_cart2harm(jnp.asarray(s["q_cart"]), 2).astype(jnp.float32)
frames = construct_local_frames(
    pos, box, jnp.asarray(s["axis_types"]), jnp.asarray(s["axis_indices"])
)
qg = rot_local2global(q_local, frames, 2)

# observed occupancy ratio for the 2-D bucketing auto picks at this size
nx, ny = sp.pick_blocks_2d(grid, 6, 1, n)
m_u0, _, _ = R.mesh_coordinates(pos, box, grid, 6)
bid = np.asarray(sp.bucket_id_2d(m_u0, grid, nx, ny))
occ = np.bincount(bid, minlength=nx * ny)
ratio = occ.max() / (n / (nx * ny))
cap = sp._bucket_cap(n, nx * ny)
overflow = occ.max() > cap

rng = np.random.default_rng(1)
drift = jnp.asarray(0.0005 * rng.standard_normal((n, 3)), dtype=jnp.float32)
n_inner = 3


def timeit(fn_of_pos):
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
    return float(np.median(ts) / n_inner * 1e3)


def fwd(p):
    mesh = R.spread_to_mesh(p, box, qg, grid, 2, method="auto")
    return jnp.sum(mesh) * 1e-6


def eg(p):
    def e(pp):
        mesh = R.spread_to_mesh(pp, box, qg, grid, 2, method="auto")
        return jnp.sum(mesh * mesh) * 1e-9
    v, g = jax.value_and_grad(e)(p)
    return v + jnp.sum(g) * 0.0


ms_fwd = timeit(fwd)
ms_eg = timeit(eg)
print(
    f"RESULT factor={{factor:.2f}} cap={{cap}} occ_max/mean={{ratio:.3f}} "
    f"overflow={{overflow}} fwd={{ms_fwd:.2f}} e+g={{ms_eg:.2f}}",
    flush=True,
)
"""


def main():
    repo = str(pathlib.Path(__file__).resolve().parents[1])
    child = CHILD.format(repo=repo)
    lines = []
    for factor in ("2.5", "1.6", "1.2"):
        proc = subprocess.run(
            [sys.executable, "-c", child, factor],
            capture_output=True, text=True, timeout=2400,
        )
        for ln in proc.stdout.splitlines():
            if ln.startswith("RESULT"):
                print(ln, flush=True)
                lines.append(ln)
        if proc.returncode != 0:
            print(proc.stderr[-2000:], flush=True)
            lines.append(f"factor={factor} FAILED")
    OUT.write_text("\n".join(lines) + "\n")
    print(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
