#!/usr/bin/env python
"""Benchmark: polarizable water energy+force step on the real device.

Prints JSON lines {"metric", "value", "unit", "vs_baseline"[, "secondary"]}
to stdout, flushing the primary metric the moment it is measured and a final
combined line once the secondary lands — the driver reads the LAST complete
line, so an interrupted run still delivers the primary. Diagnostics go to
stderr. A wall-clock budget (ADMP_TPU_BENCH_BUDGET_S, default 420 s) gates
the secondary workload and arms a force-exit-0 watchdog.

Primary workload (BASELINE.md north star, mirroring the reference's
examples/water_pol_1024/run_admp.py:134-139): a water_pol_1024-class system —
1000 waters (3000 atoms) at liquid density (the shipped 50 A polarizable box
suffers a polarization catastrophe, see tests/test_golden_water.py; the
synthetic liquid box is the physically-meaningful stand-in) — one energy+force
step of polarizable multipolar PME (lmax=2, Thole SCF via warm-started PCG
with implicit-VJP forces), jit-compiled, float32 on TPU, fixed-capacity
neighbor pairs. Positions drift ~5e-3 A/step inside the timing loop so the
SCF warm start works as it does along a real MD trajectory (0-2 iterations)
rather than converging trivially on a static geometry.

Secondary workload: the reference's flagship nonpolarizable example
(examples/water_1024/run_admp.py) — 3072-atom MPID water box, full force
field: electrostatic PME (lmax=2, K=154^3) + dispersion PME (C6/C8/C10) +
Tang-Toennies short-range.

The reference publishes no timing numbers (BASELINE.md): vs_baseline is
self-referential — the ratio of the previous round's recorded value for the
SAME metric to this run (>1 = faster than last round), 1.0 when no history
for the metric exists.
"""

import json
import os
import pathlib
import sys
import threading
import time

import numpy as np

# Wall-clock budget (seconds). The driver runs `python bench.py` under its own
# timeout; round 3 died to it (BENCH_r03.json rc=124, parsed=null) because the
# old script printed its single JSON line only after EVERY workload had
# compiled through the remote-compile tunnel. Contract now:
#   * the PRIMARY metric is printed (flush=True) the moment it is measured —
#     the driver reads the tail, last complete line wins;
#   * the secondary workload only runs if enough budget remains;
#   * a watchdog force-exits 0 at the budget so whatever lines were flushed
#     stand instead of an rc=124 with an empty tail.
BUDGET_S = float(os.environ.get("ADMP_TPU_BENCH_BUDGET_S", "420"))
_T0 = time.perf_counter()


def _elapsed():
    return time.perf_counter() - _T0


def _log(msg):
    print(f"[bench {_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


_EMITTED = False


def _emit(record):
    global _EMITTED
    print(json.dumps(record), flush=True)
    _EMITTED = True



def _build_pairs_on_cpu(positions, box, rc):
    """Neighbor-list allocation on the host CPU backend: the list is tiny
    and deterministic, while building it on the TPU costs 2-4 min of
    remote-compile tunnel before the first timed step (ROADMAP round-4
    next-step 5). Falls back to the default device on any failure."""
    import numpy as _np

    import jax

    from admp_tpu.ops.neighborlist import neighbor_list_cell

    try:
        jax.devices()  # init the accelerator FIRST (CLAUDE.md: mixed
        # CPU+TPU backend discovery breaks the other way around)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            return neighbor_list_cell(
                _np.asarray(positions), _np.asarray(box), rc
            )
    except Exception as exc:  # noqa: BLE001 - never lose the bench to this
        _log(f"CPU neighbor-list build failed ({exc!r}); using default device")
        return neighbor_list_cell(positions, box, rc)


def build_pol_workload():
    """Polarizable PME step, warm-started SCF threaded through an MD-style
    scan (reference driver: examples/water_pol_1024/run_admp.py:134-139)."""
    import jax
    import jax.numpy as jnp

    from admp_tpu import ADMPPmeForce, SCFConfig, convert_cart2harm
    from admp_tpu.ops.neighborlist import neighbor_list_cell
    from admp_tpu.systems import water_system

    sysd = water_system(n_side=10, spacing=3.104, jitter=0.12, seed=0)
    positions, box = jnp.asarray(sysd["positions"]), jnp.asarray(sysd["box"])
    n = positions.shape[0]

    rc, ethresh = 4.0, 1e-4
    nlist = _build_pairs_on_cpu(positions, box, rc)
    pairs = jnp.asarray(nlist.pairs)

    q_local = convert_cart2harm(jnp.asarray(sysd["q_cart"]), 2)
    pol = jnp.asarray(sysd["pol"])
    tholes = jnp.asarray(sysd["tholes"])
    scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])

    from admp_tpu.settings import EngineConfig

    # Production MD profile (SCFConfig.md()): Feynman-Hellmann gradients —
    # the reference's own gradient semantics (admp/pme.py:83,114-125) — at
    # field_tol=0.3 (vs the reference's 10): measured FH force error 4.1e-5
    # relative, an order below the f32 working floor, at ~2 warm PCG
    # iterations/step (examples/fh_accuracy_cpu.out). The exact-adjoint
    # default costs the adjoint solve + field-VJP on every force call
    # (measured honestly in examples/pol_ablation_tpu.out) and is the right
    # choice for fitting, not for MD stepping.
    pme = ADMPPmeForce(
        box, sysd["axis_types"], sysd["axis_indices"], sysd["covalent_map"],
        rc, ethresh, lmax=2, lpol=True,
        config=EngineConfig(cache_influence=True, scf=SCFConfig.md(),
                            pairs_i_sorted=True),
    )
    # lane-aligned mesh rows (K3 % 128 == 0) ride the row-gather spread
    # adjoint; the heuristic 96^3 grid misses it. Measured ladder
    # (examples/pol_grid_tpu.out): 96^3 21.99 / (96,96,128) 17.91 /
    # 128^3 18.39 ms. z is FINER than the heuristic asks — accuracy only
    # improves.
    pme.K3 = 128
    pme.refresh_calculators()

    # deterministic small per-step drift (~5e-3 A) so warm-started PCG does
    # its real 0-2 iterations per step instead of trivially re-converging
    rng = np.random.default_rng(1)
    drift = jnp.asarray(0.005 * rng.standard_normal((n, 3)))

    vga = pme._value_grad_aux
    n_inner = 10

    @jax.jit
    def multi_step(pos, u):
        def body(carry, _):
            p, u_prev = carry
            (e, (u_new, _conv, _n_it)), f = vga(
                p, box, pairs, q_local, pol, tholes,
                scales, scales, scales, u_prev,
            )
            # f MUST feed the carry: an unused force output lets XLA
            # dead-code-eliminate the entire backward pass (adjoint solve,
            # field-VJP, position gradients) and the "e+g" timing silently
            # becomes energy+solve-only (discovered round 3; earlier
            # polarizable numbers carried this flaw — see ROADMAP.md)
            return (p + drift + 0.0 * f, u_new), e

        (p_out, u_out), es = jax.lax.scan(
            body, (pos, u), None, length=n_inner
        )
        return p_out, u_out, es

    # The cold SCF solve rides the SAME jit as the timed loop: the warmup
    # call starts from u=0 (the while_loop PCG converges in ~7 iterations —
    # no extra compile, unlike the old separate optimize_Uind jit) and its
    # converged dipoles seed the timed runs with a realistic MD warm state.
    u0 = jnp.zeros((n, 3), dtype=positions.dtype)

    def warm_state(warm_out):
        _p_out, u_out, _es = warm_out
        return (positions, u_out)

    return multi_step, (positions, u0), n_inner, warm_state


def build_nonpol_workload():
    """Nonpolarizable full-force-field step on the shipped water_1024 box
    (reference driver: examples/water_1024/run_admp.py)."""
    import jax
    import jax.numpy as jnp

    from admp_tpu import (
        ADMPDispPmeForce,
        ADMPPmeForce,
        convert_cart2harm,
        generate_pairwise_interaction,
        tt_damping_qq_c6_kernel,
    )
    from admp_tpu.ops.neighborlist import neighbor_list_cell

    ref_pdb = pathlib.Path("/root/reference/examples/water_1024/water1024.pdb")
    if ref_pdb.exists():
        from admp_tpu.io import load_mpid_system

        sysd = load_mpid_system(
            str(ref_pdb),
            str(ref_pdb.parent / "mpidwater.xml"),
        )
        positions, box = sysd.positions, sysd.box
        axis_types, axis_indices = sysd.axis_types, sysd.axis_indices
        covalent_map = sysd.covalent_map
        q_cart = sysd.q_cart
        n = sysd.n_atoms
        from admp_tpu.systems import water_system as _ws  # params only
        params = _ws(n_side=1)
        nmol = n // 3
        c_list = np.tile(params["c_list"][:3], (nmol, 1))
        tt_a = np.tile(params["tt_a"][:3], nmol)
        tt_b = np.tile(params["tt_b"][:3], nmol)
        tt_q = np.tile(params["tt_q"][:3], nmol)
    else:
        from admp_tpu.systems import water_system

        sysd = water_system(n_side=10, spacing=3.104, jitter=0.12, seed=0)
        positions, box = sysd["positions"], sysd["box"]
        axis_types, axis_indices = sysd["axis_types"], sysd["axis_indices"]
        covalent_map = sysd["covalent_map"]
        q_cart = sysd["q_cart"]
        c_list, tt_a, tt_b, tt_q = (
            sysd["c_list"], sysd["tt_a"], sysd["tt_b"], sysd["tt_q"]
        )
        n = positions.shape[0]

    import jax.numpy as jnp

    rc, ethresh = 4.0, 1e-4
    nlist = _build_pairs_on_cpu(positions, box, rc)
    pairs = jnp.asarray(nlist.pairs)

    box_j = jnp.asarray(box)
    q_local = convert_cart2harm(jnp.asarray(q_cart), 2)
    m_scales = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0])

    # reference-parity electrostatics (K from the OpenMM heuristic, kappa
    # pinned to the MPID value). Dispersion at the measured accuracy/cost
    # sweet spot (ROADMAP round 2, examples/disp_tuning_tpu.out): order-4
    # spreading + disp_ethresh=2e-4 (K=129^3) holds the energy delta at
    # 1.1e-4 relative (the nominal ethresh accuracy class) with force RMSE
    # 3.5e-6, and cuts the full step 63.0 -> ~37 ms (order-6 parity grids:
    # 53.9 ms; order-4 at K=101: 31.7 ms at 2.6e-4). Fixed-cell influence
    # caching on.
    from admp_tpu.settings import EngineConfig

    pme = ADMPPmeForce(
        box_j, axis_types, axis_indices, covalent_map, rc, ethresh, lmax=2,
        config=EngineConfig(cache_influence=True, pairs_i_sorted=True),
    )
    pme.kappa = 0.657065221219616
    # K=128 electro grid (vs heuristic 154): dE -0.50 kJ/mol, force RMSE
    # 1.9e-4 relative — both under the plain-f32 floor of 4.3e-4
    # (examples/electro_tuning_tpu.out); power-of-two FFT
    pme.K1, pme.K2, pme.K3 = 128, 128, 128
    pme.refresh_calculators()
    disp = ADMPDispPmeForce(
        box_j, covalent_map, rc, ethresh, pmax=10,
        config=EngineConfig(disp_ethresh=2e-4, disp_spread_order=4,
                            cache_influence=True, pairs_i_sorted=True),
    )
    disp.kappa = 0.657065221219616
    # K=128 instead of the heuristic 129 (which contains the prime factor
    # 43 — a slow FFT size): dE -6.68 kJ/mol of 70104 (9.5e-5 relative,
    # inside the 1e-4 class), force RMSE 1.7e-6 vs parity grids (CPU f64)
    disp.K1, disp.K2, disp.K3 = 128, 128, 128
    disp.refresh_calculators()
    tt = generate_pairwise_interaction(tt_damping_qq_c6_kernel, covalent_map,
                                       pairs_i_sorted=True)

    c_j = jnp.asarray(c_list)
    a_j, b_j, q_j = jnp.asarray(tt_a), jnp.asarray(tt_b), jnp.asarray(tt_q)

    def total_energy(pos):
        e = pme.get_energy(pos, box_j, pairs, q_local, m_scales)
        e = e + disp.get_energy(pos, box_j, pairs, c_j, m_scales)
        e = e + tt(pos, box_j, pairs, m_scales, a_j, b_j, q_j, c_j[:, 0])
        return e

    grad_step = jax.value_and_grad(total_energy)
    n_inner = 10

    @jax.jit
    def multi_step(pos):
        # MD-loop measurement: N steps inside one scan, as a production
        # integrator runs — amortizes host->device dispatch latency
        def body(p, _):
            e, f = grad_step(p)
            return p + 0.0 * f, e
        return jax.lax.scan(body, pos, None, length=n_inner)

    pos_j = jnp.asarray(positions)
    return multi_step, (pos_j,), n_inner, None


def time_workload(step, args, n_inner, warm_state=None, n_repeat=5):
    import jax

    t0 = time.perf_counter()
    out = step(*args)  # warmup / compile
    jax.block_until_ready(out)
    dt_warm = time.perf_counter() - t0
    # Compile-vs-cache diagnostic: a warm persistent XLA cache
    # (~/.cache/admp_tpu/xla) makes this seconds; a cold cache goes through
    # the remote-compile tunnel (minutes).
    _log(f"warmup (compile or cache hit) took {dt_warm:.1f}s")
    if warm_state is not None:
        args = warm_state(out)

    times = []
    for _ in range(n_repeat):
        t0 = time.perf_counter()
        out = step(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times) / n_inner * 1e3)


def prev_value(metric_prefix):
    """Most recent BENCH_r*.json value whose metric matches the prefix —
    either as the primary metric or under "secondary"."""
    for path in sorted(pathlib.Path(__file__).parent.glob("BENCH_r*.json"),
                       reverse=True):
        try:
            rec = json.loads(path.read_text())
            parsed = rec.get("parsed", rec)
            if parsed.get("metric", "").startswith(metric_prefix):
                return float(parsed["value"])
            sec = parsed.get("secondary") or {}
            if sec.get("metric", "").startswith(metric_prefix):
                return float(sec["value"])
        except Exception:
            continue
    return None


def _primary_record(ms_pol):
    prev_pol = prev_value("water_pol")
    return {
        "metric": "water_pol 3000-atom polarizable PME energy+force step "
                  "(lmax=2 Thole SCF, warm PCG, MD profile FH@0.3; "
                  "vs prev round, no published baseline)",
        "value": round(ms_pol, 3),
        "unit": "ms",
        "vs_baseline": round(prev_pol / ms_pol, 4) if prev_pol else 1.0,
    }


def main():
    # Watchdog: at the budget, force-exit — the flushed lines stand. Exit 0
    # only if the primary record actually landed; a hung/failed primary must
    # read as a FAILURE (rc=1), not as a clean run with no output
    # (ADVICE r4: os._exit(0) with nothing flushed was indistinguishable
    # from success to the driver).
    def _watchdog():
        rc = 0 if _EMITTED else 1
        _log(f"watchdog fired at {BUDGET_S:.0f}s budget; exiting {rc} with "
             "whatever was flushed")
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(rc)

    timer = threading.Timer(max(BUDGET_S - _elapsed() - 5.0, 1.0), _watchdog)
    timer.daemon = True
    timer.start()

    _log("building polarizable (primary) workload")
    ms_pol = time_workload(*build_pol_workload())
    record = _primary_record(ms_pol)
    _emit(record)  # primary lands NOW — a later timeout cannot erase it
    _log(f"primary: {ms_pol:.3f} ms/step")

    # Secondary only if enough budget remains: cold through the compile
    # tunnel the nonpol workload has taken ~3-4 min; warm-cache it is ~30 s.
    remaining = BUDGET_S - _elapsed()
    if remaining < 60.0:
        _log(f"skipping secondary workload ({remaining:.0f}s of budget left)")
        return
    _log("building nonpolarizable water_1024 (secondary) workload")
    try:
        ms_nonpol = time_workload(*build_nonpol_workload())
    except Exception as exc:  # primary already stands; never lose it
        _log(f"secondary workload failed: {exc!r}")
        return
    prev_nonpol = prev_value("water_1024")
    record["secondary"] = {
        "metric": "water_1024 energy+force step (PME lmax=2 + disp PME + TT)",
        "value": round(ms_nonpol, 3),
        "unit": "ms",
        "vs_baseline": (
            round(prev_nonpol / ms_nonpol, 4) if prev_nonpol else 1.0
        ),
    }
    _emit(record)
    _log(f"secondary: {ms_nonpol:.3f} ms/step")


if __name__ == "__main__":
    main()
