"""TPU (Mosaic) lowering regression tests, runnable from CPU-only CI.

Interpret-mode Pallas tests execute kernel *semantics* but never run the
Mosaic compiler, so an entire class of TPU-only failures is invisible to
them: primitives with no Mosaic lowering rule inside kernel bodies.
Two real instances motivated this file (round 3):

- second-order AD through in-kernel row slices: JAX's pad transpose emits
  NEGATIVE pads (crops), which Mosaic rejects ("vector types must have
  positive constant sizes") — hit by the exact-adjoint SCF, whose field
  VJP differentiates the pair kernel's backward (fixed by tuple-of-rows
  kernel bodies, ops/pallas/pairs.py);
- `pvary` ops inserted by shard_map's vma tracking inside kernel bodies
  ("Unimplemented primitive in Pallas TPU lowering: pvary") — fixed by
  check_vma=False on the parallel layer's shard_maps plus vma-annotated
  out_shapes (ops/pallas/vma.py).

`jax.jit(f).trace(args).lower(lowering_platforms=('tpu',))` runs the full
Mosaic pipeline locally without needing a TPU device, so these tests keep
the TPU compile path green from the CPU test environment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admp_tpu import ADMPPmeForce, EngineConfig, SCFConfig, convert_cart2harm
from admp_tpu.systems import water_system


def _lower_tpu(fn, *args):
    # production TPU runs are x64-off; under the test env's jax_enable_x64
    # Python float literals inside kernels would trace as f64 and hit
    # Mosaic's unsupported f64->f32 cast instead of what we're testing
    from jax._src.config import enable_x64

    with enable_x64(False):
        jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


@pytest.fixture(scope="module")
def small_pol_f32():
    s = water_system(n_side=2, spacing=3.1, jitter=0.12, seed=0)
    n = s["positions"].shape[0]
    pairs = [[i, j] for i in range(n) for j in range(i + 1, n)]
    cap = -(-len(pairs) // 128) * 128
    pairs += [[n, n]] * (cap - len(pairs))
    q_local = convert_cart2harm(
        jnp.asarray(s["q_cart"], jnp.float32), 2
    ).astype(jnp.float32)
    m = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0], jnp.float32)
    args = (
        jnp.asarray(s["positions"], jnp.float32),
        jnp.asarray(s["box"], jnp.float32),
        jnp.asarray(pairs, jnp.int32),
        q_local,
        jnp.asarray(s["pol"], jnp.float32),
        jnp.asarray(s["tholes"], jnp.float32),
        m, m, m,
    )
    return s, args


def test_polarizable_exact_adjoint_lowers_for_tpu(small_pol_f32):
    """The flagship graph (__graft_entry__.entry): polarizable PME with the
    implicit-VJP exact adjoint, Pallas pair kernel FORCED on so the CPU
    trace contains the fwd+bwd+hvp kernel chain Mosaic must compile."""
    s, args = small_pol_f32
    force = ADMPPmeForce(
        args[1], s["axis_types"], s["axis_indices"], s["covalent_map"],
        3.0, 1e-3, 2, lpol=True,
        config=EngineConfig(pair_kernel="pallas", scf=SCFConfig(max_iter=20)),
    )
    u0 = jnp.zeros((args[0].shape[0], 3), jnp.float32)

    def step(positions):
        (energy, _aux), forces = force._value_grad_aux(
            positions, *args[1:], u0
        )
        return energy, forces

    _lower_tpu(step, args[0])


def test_pallas_spread_energy_grad_lowers_for_tpu(small_pol_f32):
    """Forced Pallas spreading (slab kernel + row-gather adjoint) through
    energy+gradient, Mosaic-lowered from the CPU process."""
    s, args = small_pol_f32
    from admp_tpu.ops.influence import ck_1
    from admp_tpu.ops.reciprocal import make_pme_recip

    recip = make_pme_recip(
        ck_1, 0.6, False, (16, 16, 16), 2, spread_method="pallas",
    )

    def e(positions):
        return recip(positions, args[1], args[3])

    _lower_tpu(jax.value_and_grad(e), args[0].astype(jnp.float32))


def test_pair_kernel_second_order_lowers_for_tpu(small_pol_f32):
    """grad-of-grad through the fused pair kernel: the custom-vjp backward
    (_pair_bwd_op) appears in the primal of the outer grad, so its OWN
    backward — the in-kernel HVP — must Mosaic-lower. This is the exact
    graph shape the implicit-SCF adjoint produces."""
    from admp_tpu.ops.pallas.pairs import pair_perm_energies, table_width

    lmax, lpol = 2, True
    f_cols = table_width(lmax, lpol)
    c = 128
    rng = np.random.RandomState(0)
    g_i = jnp.asarray(rng.randn(c, f_cols), jnp.float32)
    g_j = jnp.asarray(rng.randn(c, f_cols), jnp.float32)
    scl = jnp.asarray(rng.rand(3, c), jnp.float32)
    scal = jnp.concatenate(
        [jnp.full((1,), 0.6, jnp.float32),
         jnp.eye(3, dtype=jnp.float32).reshape(9) * 6.0,
         jnp.eye(3, dtype=jnp.float32).reshape(9) / 6.0]
    )

    def e(gi):
        return jnp.sum(pair_perm_energies(gi, g_j, scl, scal, lmax,
                                           block=128, kind="pol"))

    def grad_norm(gi):
        g = jax.grad(e)(gi)
        return jnp.sum(g * g)

    _lower_tpu(jax.grad(grad_norm), g_i)
