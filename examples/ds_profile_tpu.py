#!/usr/bin/env python
"""Component profile of the DS reciprocal engine on the real TPU (f32 process).

Times: full energy+force step, forward-only, the 3-D DS rfft, the full 3-D DS
FFT (backward's transform), the k-space DS weights grid, the spline-table +
stencil-product pipeline, and the fixed-point scatter. lax.scan-amortized.
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n_inner=10, n_rep=4):
    @jax.jit
    def multi(*a):
        def body(c, _):
            out = fn(*a)
            # fold output into a scalar carry so nothing is hoisted
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l[..., :1]) if l.ndim else l for l in leaves)
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n_inner)
        return c

    r = multi(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        jax.block_until_ready(multi(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) / n_inner * 1e3)


OUT = pathlib.Path(__file__).with_suffix(".out")


def main():
    lines = []
    for attempt in range(5):
        try:
            float(jnp.zeros(()) + 1.0)
            break
        except Exception:
            time.sleep(20.0)
    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    emit(f"# devices: {jax.devices()}")

    from admp_tpu.io import load_mpid_system
    from admp_tpu import convert_cart2harm
    from admp_tpu.ops import dsrecip
    from admp_tpu.utils import ds

    d = "/root/reference/examples/water_1024"
    sysd = load_mpid_system(f"{d}/water1024.pdb", f"{d}/mpidwater.xml")
    pos = jnp.asarray(np.asarray(sysd.positions, np.float32))
    box = jnp.asarray(np.asarray(sysd.box, np.float32))
    q = jnp.asarray(
        np.asarray(convert_cart2harm(jnp.asarray(sysd.q_cart), 2), np.float32))
    K = 128
    kappa = 0.657065221219616
    engine = dsrecip.make_ds_pme_recip(kappa, (K, K, K), 2)

    eg = jax.value_and_grad(lambda p, qq: engine(p, box, qq), argnums=(0, 1))
    ms = timeit(lambda: eg(pos, q))
    emit(f"full e+g step        {ms:8.2f} ms")

    ms = timeit(lambda: engine(pos, box, q))
    emit(f"forward energy only  {ms:8.2f} ms")

    rng = np.random.default_rng(0)
    mesh_hi = jnp.asarray(rng.standard_normal((K, K, K)), jnp.float32)
    mesh_lo = mesh_hi * jnp.float32(1e-8)

    ms = timeit(lambda m: dsrecip.ds_rfft3((m, mesh_lo)), mesh_hi)
    emit(f"ds_rfft3 (half)      {ms:8.2f} ms")

    re = (mesh_hi, mesh_lo)
    im = (mesh_hi * jnp.float32(0.5), mesh_lo)
    ms = timeit(lambda a: dsrecip.ds_fft3((a, mesh_lo), im), mesh_hi)
    emit(f"ds_fft3 (full cmplx) {ms:8.2f} ms")

    sr, si = dsrecip.ds_rfft3((mesh_hi, mesh_lo))
    ms = timeit(lambda a: dsrecip.ds_irfft3((a, sr[1]), si), sr[0])
    emit(f"ds_irfft3 (half)     {ms:8.2f} ms")

    ms = timeit(lambda b: dsrecip._kspace_weights_ds(b, (K, K, K), kappa,
                                                     rfft=True), box)
    emit(f"kspace weights grid  {ms:8.2f} ms")

    def stencil(p, qq):
        m_u0, u0, binv = dsrecip._ds_mesh_coords(p, box, (K, K, K))
        tabs4 = dsrecip.ds_spline_tables(u0)
        mixing, n_t = dsrecip._ds_mixing_matrix(binv, (K, K, K), 2)
        alphas = dsrecip._ds_alpha(qq, mixing, n_t, 2)
        qp = dsrecip._ds_q_points(alphas, tabs4[:3], 2)
        return qp

    ms = timeit(stencil, pos, q)
    emit(f"spline+stencil pipe  {ms:8.2f} ms")

    m_u0, u0, binv = dsrecip._ds_mesh_coords(pos, box, (K, K, K))
    tabs4 = dsrecip.ds_spline_tables(u0)
    mixing, n_t = dsrecip._ds_mixing_matrix(binv, (K, K, K), 2)
    alphas = dsrecip._ds_alpha(q, mixing, n_t, 2)
    qp = dsrecip._ds_q_points(alphas, tabs4[:3], 2)
    flat = dsrecip._flat_stencil(m_u0, (K, K, K)).reshape(-1)

    ms = timeit(lambda f_, a, b: dsrecip._fp_scatter_ds(f_, (a, b), K ** 3,
                                                        (K, K, K)),
                flat, qp[0], qp[1])
    emit(f"fixed-point scatter  {ms:8.2f} ms")


    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
