"""shard_map compatibility for raw ``pallas_call`` sites.

Under ``jax.shard_map`` with ``check_vma=True`` (the default), a
``pallas_call``'s ``out_shape`` must declare which mesh axes the output
varies over; a plain ``jax.ShapeDtypeStruct`` (``vma=None``) is rejected
at trace time. Every kernel in this package is pointwise in the sharded
dimension — each program reads only its own operand blocks — so the
output varies over exactly the union of the operand ``vma`` sets.
Outside ``shard_map`` every aval has ``vma=frozenset()`` and the
annotation is a no-op.
"""

from __future__ import annotations

import jax


def out_struct(shape, dtype, *operands):
    """``jax.ShapeDtypeStruct`` carrying the union vma of ``operands``."""
    vma = frozenset()
    for x in operands:
        v = getattr(jax.typeof(x), "vma", None)
        if v:
            vma = vma | v
    try:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except TypeError:  # pragma: no cover - older JAX without the kwarg
        return jax.ShapeDtypeStruct(shape, dtype)
