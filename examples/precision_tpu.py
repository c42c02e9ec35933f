#!/usr/bin/env python
"""TPU float32 precision validation (BASELINE.md north star: f32 force RMSE
< 1e-6 relative vs float64 on water_1024).

Runs the full electrostatic PME energy+force step on the REAL TPU in every
precision mode and compares against the CPU float64 oracle evaluated at the
same f32-representable inputs (so input rounding is excluded and the number
measures pipeline rounding only). Also times each mode with a lax.scan MD-loop
measurement (dispatch-amortized), giving the accuracy/cost trade-off table.

Requires jax_enable_x64 (float64 on TPU is elementwise-emulated; this script
is the validation that the emulated path works — ROADMAP round-2 item).

Output -> examples/precision_tpu.out (committed artifact).
"""

import pathlib
import sys
import time

import numpy as np

# NOTE: do NOT run this with PYTHONPATH=/root/repo — that env var breaks the
# TPU plugin's backend discovery in this environment. Inserting the repo root
# on sys.path at runtime is safe.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from admp_tpu import ADMPPmeForce  # noqa: E402
from admp_tpu.settings import EngineConfig  # noqa: E402
from admp_tpu.io import load_mpid_system  # noqa: E402
from admp_tpu.ops.harmonics import convert_cart2harm  # noqa: E402
from admp_tpu.ops.neighborlist import neighbor_list_cell  # noqa: E402

KAPPA = 0.657065221219616
OUT = pathlib.Path(__file__).with_suffix(".out")

MODES = [
    ("plain-f32", EngineConfig(compensated_sums=False)),
    ("comp-sums", EngineConfig()),
    ("spread-f64", EngineConfig(spread_precision="f64")),
    ("high (excl+recip f64)", EngineConfig.high_accuracy()),
    ("ultra (real-all f64)",
     EngineConfig.high_accuracy(realspace_precision="f64-all")),
    ("ultra-dft (matmul DFT)",
     EngineConfig.high_accuracy(realspace_precision="f64-all",
                                recip_precision="f64-dft")),
]


def main():
    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(str(msg))

    # initialize the default (accelerator) platform BEFORE requesting the CPU
    # backend — asking for 'cpu' first makes the plugin registry reject the
    # axon platform in this environment
    tpu = [d for d in jax.devices() if d.platform != "cpu"]
    cpu = jax.local_devices(backend="cpu")[0]
    emit(f"# devices: {jax.devices()}  (accelerator: {tpu})")
    dev = tpu[0] if tpu else cpu

    s = load_mpid_system(
        "/root/reference/examples/water_1024/water1024.pdb",
        "/root/reference/examples/water_1024/mpidwater.xml",
    )
    with jax.default_device(cpu):
        # keep the NL arrays CPU-committed: f64 arrays created on the
        # accelerator would drag the cell kernels through the emulated-f64
        # remote-compile path (observed hanging for >30 min in round 3)
        pos64 = jax.device_put(jnp.asarray(s.positions, jnp.float64), cpu)
        box64 = jax.device_put(jnp.asarray(s.box, jnp.float64), cpu)
        nl = neighbor_list_cell(pos64, box64, 4.0)
    pairs = np.asarray(nl.pairs)
    q64 = convert_cart2harm(jnp.asarray(s.q_cart, jnp.float64), 2)
    m64 = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0], jnp.float64)

    # f32-representable inputs, shared by oracle and TPU runs
    pos32 = np.asarray(pos64, np.float32)
    box32 = np.asarray(box64, np.float32)
    q32 = np.asarray(q64, np.float32)
    m32 = np.asarray(m64, np.float32)

    def build(cfg):
        f = ADMPPmeForce(
            jnp.asarray(box32), s.axis_types, s.axis_indices, s.covalent_map,
            4.0, 1e-4, lmax=2, config=cfg,
        )
        f.update_env("kappa", KAPPA)
        return f

    # CPU float64 oracle at the f32-rounded inputs
    with jax.default_device(cpu):
        oracle = build(None)
        e_ref, f_ref = oracle.get_forces(
            jnp.asarray(pos32, jnp.float64), jnp.asarray(box32, jnp.float64),
            jnp.asarray(pairs), jnp.asarray(q32, jnp.float64),
            jnp.asarray(m32, jnp.float64),
        )
        e_ref = float(e_ref)
        f_ref = np.asarray(f_ref, np.float64)
    emit(f"# CPU f64 oracle: E = {e_ref:.9f} kJ/mol (expect ~148.207 at "
         f"f32-rounded inputs; 148.20335 at full-precision inputs)")

    f_norm = float(np.sqrt((f_ref**2).mean()))

    n_inner = 10

    def measure(name, force, e_ref_, f_ref_, f_norm_):
        with jax.default_device(dev):
            pos_d = jnp.asarray(pos32)
            box_d = jnp.asarray(box32)
            pairs_d = jnp.asarray(pairs)
            q_d = jnp.asarray(q32)
            m_d = jnp.asarray(m32)

            grad_step = jax.value_and_grad(
                lambda p: force.get_energy(p, box_d, pairs_d, q_d, m_d)
            )
            # positions MUST drift per step: a loop-invariant body lets XLA
            # hoist per-step work out of the scan and the timing silently
            # amortizes one real evaluation over n_inner (the round-2
            # hoisted-loop trap; the round-3 DS timing rows of this artifact
            # carried it -- see examples/dsbisect_tpu.out / ROADMAP round 5).
            # Accuracy rows are unaffected (step-0 values). The drift is
            # 5e-4 A: far below any accuracy-visible scale.
            drift_d = jnp.asarray(
                5e-4 * np.random.default_rng(7).standard_normal(pos32.shape),
                pos_d.dtype,
            )

            @jax.jit
            def multi(p):
                def body(pp, _):
                    e, f = grad_step(pp)
                    return pp + drift_d + 0.0 * f, (e, f)
                return jax.lax.scan(body, p, None, length=n_inner)

            try:
                _, (es, fs) = multi(pos_d)
                jax.block_until_ready((es, fs))
            except Exception as exc:  # noqa: BLE001
                emit(f"{name:24s}  FAILED: {type(exc).__name__}: {exc}")
                return
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = multi(pos_d)
                jax.block_until_ready(out)
                times.append(time.perf_counter() - t0)
            ms = float(np.median(times) / n_inner * 1e3)
            e_val = float(es[0])
            f_val = np.asarray(fs[0], np.float64)
        d = f_val - f_ref_
        rel = float(np.sqrt((d**2).mean()) / f_norm_)
        emit(f"{name:24s}  dE={e_val - e_ref_:+.4g} kJ/mol  "
             f"rel-F-RMSE={rel:.4g}  {ms:.2f} ms/step")

    if "--only-ds" not in sys.argv:
        for name, cfg in MODES:
            measure(name, build(cfg), e_ref, f_ref, f_norm)

    # ----- double-single section (power-of-two K=128 grid; each mode
    # compares against an oracle at ITS grid so the number isolates pipeline
    # rounding, the ladder's methodology) -----
    emit("# K=128 section (DS engine needs power-of-two grids; oracle at "
         "the same K)")

    def build128(cfg):
        f = build(cfg)
        f.kappa = KAPPA
        f.K1 = f.K2 = f.K3 = 128
        f.refresh_calculators()
        return f

    with jax.default_device(cpu):
        oracle128 = build128(None)
        e_ref1, f_ref1 = oracle128.get_forces(
            jnp.asarray(pos32, jnp.float64), jnp.asarray(box32, jnp.float64),
            jnp.asarray(pairs), jnp.asarray(q32, jnp.float64),
            jnp.asarray(m32, jnp.float64),
        )
        e_ref1 = float(e_ref1)
        f_ref1 = np.asarray(f_ref1, np.float64)
    f_norm1 = float(np.sqrt((f_ref1**2).mean()))

    DS_MODES = [
        ("plain-f32 @128", EngineConfig()),
        ("ds recip @128", EngineConfig(recip_precision="ds")),
        ("ds+near2.0 @128", EngineConfig.ds_accuracy(realspace_near_radius=2.0)),
        ("ds+near2.5 @128", EngineConfig.ds_accuracy(realspace_near_radius=2.5)),
        ("ds+near2.5+cache @128",
         EngineConfig.ds_accuracy(realspace_near_radius=2.5,
                                  cache_influence=True)),
    ]
    for name, cfg in DS_MODES:
        measure(name, build128(cfg), e_ref1, f_ref1, f_norm1)

    if "--only-ds" in sys.argv and OUT.exists():
        # refresh only the K=128 section of the committed artifact
        old = OUT.read_text().splitlines()
        cut = next((i for i, ln in enumerate(old)
                    if ln.startswith("# K=128 section")), len(old))
        own = next((i for i, ln in enumerate(lines)
                    if ln.startswith("# K=128 section")), 0)
        lines[:own] = old[:cut]
    OUT.write_text("\n".join(lines) + "\n")
    emit(f"# wrote {OUT}")


if __name__ == "__main__":
    main()
