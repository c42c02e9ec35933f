#!/usr/bin/env python
"""Attribute the DS-step 40.9 -> 72.7 ms regression (round-4 VERDICT item 4).

The two committed artifacts measured "the same" DS electro preset at 40.9
(examples/precision_tpu.out, round 3) and 72.7 ms (perf_summary_tpu.out,
round 4) and ROADMAP left the delta unattributed. The harnesses differ in:

  * jax_enable_x64: precision_tpu runs with x64 ON (its f64 modes need it;
    'f64-near' in ds_accuracy() only does real f64 work when x64 is on —
    with x64 OFF the delta pass silently computes in f32: cost, no benefit);
  * scan length 10 vs 5 (dispatch amortization through the ~30 ms tunnel);
  * drift: perf_summary drifts positions per step, precision_tpu holds them.

This probe measures one matrix cell per variant in ONE process per x64
mode (the flag is process-global):

    ADMP_TPU_DS_X64=1 python examples/dsbisect_tpu.py   # precision_tpu mode
    ADMP_TPU_DS_X64=0 python examples/dsbisect_tpu.py   # perf_summary mode

Rows: ds+near2.5 / +cache_influence / ds-only (no near pass), each with
drift on, n_inner=10. Appends to examples/dsbisect_tpu.out.
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).with_suffix(".out")

X64 = os.environ.get("ADMP_TPU_DS_X64", "0") == "1"

import jax  # noqa: E402

if X64:
    jax.config.update("jax_enable_x64", True)


def main():
    import jax.numpy as jnp

    from admp_tpu import ADMPPmeForce, convert_cart2harm
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.settings import EngineConfig
    from admp_tpu.io import load_mpid_system

    lines = [f"== x64={'on' if X64 else 'off'} =="]
    mark = f"== x64={'on' if X64 else 'off'} =="

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    def _flush():
        # rewrite THIS x64 section in place (survive per-row timeouts)
        old_txt = OUT.read_text() if OUT.exists() else ""
        blocks = [b for b in old_txt.split("\n\n") if b.strip()
                  and not b.startswith(mark)]
        blocks.append("\n".join(lines))
        OUT.write_text("\n\n".join(blocks) + "\n")

    sd = load_mpid_system(
        "/root/reference/examples/water_1024/water1024.pdb",
        "/root/reference/examples/water_1024/mpidwater.xml",
    )
    pos = jnp.asarray(np.asarray(sd.positions, np.float32))
    box = jnp.asarray(np.asarray(sd.box, np.float32))
    n = pos.shape[0]
    nl = neighbor_list_cell(np.asarray(pos), np.asarray(box), 4.0)
    pairs = jnp.asarray(nl.pairs)
    ql = convert_cart2harm(
        jnp.asarray(np.asarray(sd.q_cart, np.float32)), 2
    ).astype(jnp.float32)
    scales = jnp.asarray(np.array([0, 0, 0, 1, 1], np.float32))
    rng = np.random.default_rng(1)
    drift = jnp.asarray(
        0.0005 * rng.standard_normal((n, 3)), jnp.float32
    )
    n_inner = 10

    def measure(name, cfg, use_drift=True):
        pme = ADMPPmeForce(
            box, sd.axis_types, sd.axis_indices, sd.covalent_map,
            4.0, 1e-4, lmax=2, config=cfg,
        )
        pme.kappa = 0.657065221219616
        pme.K1 = pme.K2 = pme.K3 = 128
        pme.refresh_calculators()
        vg = jax.value_and_grad(
            lambda p: pme.energy_fn(p, box, pairs, ql, scales)
        )

        step_drift = drift if use_drift else jnp.zeros_like(drift)

        @jax.jit
        def loop(p):
            def body(p, _):
                e, dp = vg(p)
                return p + step_drift + 0.0 * dp, e
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
        emit(f"{name:44s} {ms:8.2f} ms/step")
        _flush()
        return ms

    measure("ds+near2.5 (precision_tpu preset)",
            EngineConfig.ds_accuracy(realspace_near_radius=2.5))
    measure("ds+near2.5+cache (perf_summary preset)",
            EngineConfig.ds_accuracy(cache_influence=True))
    measure("ds only (no near pass)",
            EngineConfig(recip_precision="ds"))
    measure("ds only + cache",
            EngineConfig(recip_precision="ds", cache_influence=True))
    # the round-3 precision_tpu harness held positions CONSTANT across the
    # scan (body: p + 0.0*f) — reproduce it to test whether the committed
    # 40.9 ms DS row was a hoisted-loop artifact (the round-2 lesson:
    # loop-invariant scan bodies get hoisted by XLA and time as ~3 ms)
    measure("ds+near2.5 NO-DRIFT (old harness)",
            EngineConfig.ds_accuracy(realspace_near_radius=2.5),
            use_drift=False)

    # Scan-free cross-check: time PER-DISPATCH python calls (median of 10)
    # minus a measured trivial-dispatch floor — harness-unambiguous (no
    # scan, nothing to hoist). If this agrees with the scan-timed rows, the
    # scan numbers are honest.
    pme = ADMPPmeForce(
        box, sd.axis_types, sd.axis_indices, sd.covalent_map,
        4.0, 1e-4, lmax=2,
        config=EngineConfig.ds_accuracy(realspace_near_radius=2.5),
    )
    pme.kappa = 0.657065221219616
    pme.K1 = pme.K2 = pme.K3 = 128
    pme.refresh_calculators()
    vg = jax.jit(jax.value_and_grad(
        lambda p: pme.energy_fn(p, box, pairs, ql, scales)
    ))
    triv = jax.jit(lambda p: p + 1.0)
    jax.block_until_ready(triv(pos))
    t_f = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(triv(pos))
        t_f.append(time.perf_counter() - t0)
    floor_ms = float(np.median(t_f) * 1e3)
    jax.block_until_ready(vg(pos))
    t_c = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(vg(pos))
        t_c.append(time.perf_counter() - t0)
    call_ms = float(np.median(t_c) * 1e3)
    emit(f"{'ds+near2.5 per-dispatch (floor-subtracted)':44s} "
         f"{call_ms - floor_ms:8.2f} ms/step  "
         f"(call {call_ms:.2f}, dispatch floor {floor_ms:.2f})")
    _flush()

    _flush()
    emit(f"# updated {OUT}")


if __name__ == "__main__":
    main()
