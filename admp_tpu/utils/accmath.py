"""Accuracy-corrected elementary functions for TPU float32.

The TPU VPU's hardware exp approximation carries ~5e-6 maximum relative error
(measured; see ROADMAP.md), ~80x worse than a correctly-rounded f32 exp. Every
Ewald screening coefficient multiplies exp(-x^2) against ~1e3..1e4-magnitude
prefactors, so this error dominates the engine's f32 force accuracy on TPU.

``exp_accurate`` recovers near-1-ulp f32 accuracy with classic range reduction:
  exp(y) = 2^k * exp(r),  k = round(y / ln 2),  r = y - k ln2 (|r| <= ln2/2)
with ln 2 split into high/low parts and a degree-7 Taylor polynomial for
exp(r) (|error| < 3e-9 relative on the reduced range). Costs ~15 VPU ops
instead of 1 — negligible against the surrounding arithmetic.

float64 (and any non-f32) inputs fall through to jnp.exp: the polynomial is
f32-grade and the f64 path (CPU verification) must keep full precision.
"""

from __future__ import annotations

import jax.numpy as jnp

_LN2_HI = 0.69314575195e0   # high bits of ln 2, exactly representable in f32
_LN2_LO = 1.42860677e-06    # ln 2 - _LN2_HI
_INV_LN2 = 1.4426950408889634


def exp_accurate(y):
    """exp(y) with ~1-ulp f32 accuracy on TPU (identity for other dtypes)."""
    if y.dtype != jnp.float32:
        return jnp.exp(y)
    k = jnp.round(y * _INV_LN2)
    r = y - k * _LN2_HI
    r = r - k * _LN2_LO
    # degree-7 Taylor; |r| <= 0.3466 -> truncation < 3e-9 relative
    p = 1.0 / 5040.0
    p = p * r + 1.0 / 720.0
    p = p * r + 1.0 / 120.0
    p = p * r + 1.0 / 24.0
    p = p * r + 1.0 / 6.0
    p = p * r + 0.5
    p = p * r + 1.0
    p = p * r + 1.0
    return jnp.ldexp(p, k.astype(jnp.int32))
