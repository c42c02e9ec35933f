"""Global configuration for admp_tpu.

The reference implementation (reference: admp/settings.py:1-30) drives precision and
jit policy through module-level globals mutated at import time. Here configuration is
explicit and functional:

* Precision is *not* forced at import. Callers (tests, benchmarks) opt into float64
  via ``jax.config.update("jax_enable_x64", True)`` / the ``JAX_ENABLE_X64`` env var
  before importing JAX. On TPU the fast path is float32 (with compensated accumulation
  where needed); float64 is for CPU-side verification against the reference goldens.
* ``maybe_jit`` mirrors the reference's ``jit_condition`` decorator factory
  (reference: admp/settings.py:12-18) but is rarely needed: the library jits whole
  energy/force functions at the top level instead of per-helper.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax

# Honour an env switch for debugging (disable jit to get eager tracebacks).
DO_JIT = os.environ.get("ADMP_TPU_DISABLE_JIT", "0") != "1"

# On TPU, f32 matmuls/einsums default to bf16 MXU passes. Every geometric
# contraction in this engine (PBC fractional transforms, frame rotations,
# quadrupole conjugations, spread-weight products) is a tiny 3x3 .. 9x9
# operation whose 8-bit-mantissa truncation destroys the large cancellations
# Ewald sums rely on (measured: water_1024 electrostatic energy 1644 vs 148
# kJ/mol). Requesting full-f32 MXU passes costs nothing at these shapes.
# Opt out with ADMP_TPU_MATMUL_PRECISION=default (e.g. for ML-potential
# hybrids that manage precision themselves).
if os.environ.get("ADMP_TPU_MATMUL_PRECISION", "highest") == "highest":
    jax.config.update("jax_default_matmul_precision", "highest")

# Induced-dipole SCF defaults, matching the reference convergence envelope
# (reference: admp/settings.py:29-30): residual field below POL_CONV (kJ/mol/A/e)
# within at most MAX_N_POL iterations.
POL_CONV = 10.0
MAX_N_POL = 30


def maybe_jit(fun=None, **jit_kwargs):
    """``jax.jit`` unless ADMP_TPU_DISABLE_JIT=1 (for eager debugging)."""
    if fun is None:
        return partial(maybe_jit, **jit_kwargs)
    if DO_JIT:
        return jax.jit(fun, **jit_kwargs)
    return fun


@dataclasses.dataclass(frozen=True)
class SCFConfig:
    """Induced-dipole solver configuration.

    method: 'pcg' (default, diagonally-preconditioned conjugate gradient on the
    induced-dipole linear system) or 'jacobi' (the reference's damped iteration,
    reference: admp/pme.py:132-138, kept for cross-validation).
    """

    method: str = "pcg"
    max_iter: int = MAX_N_POL
    field_tol: float = POL_CONV
    pol_eps: float = 0.001  # sites with pol below this do not count for convergence


def default_dtype():
    return jax.numpy.zeros(0).dtype
