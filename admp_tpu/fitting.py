"""Force-field parameter optimization loops.

This is the reference's raison d'etre — differentiable parameters for
"systematic and automatic parameter optimization" (reference: README.md:9,
examples/openmm_api/run.py:40-46 computes parameter gradients but ships no
optimizer). Here the loop is first-class: jit-compiled optax steps over
energy/force-matching losses, with structured metrics and orbax checkpointing.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp

from admp_tpu.checkpoint import restore_checkpoint, save_checkpoint


@dataclasses.dataclass
class FitResult:
    params: dict
    history: list
    steps: int


def energy_force_loss(potential_fn, energy_weight=1.0, force_weight=0.1):
    """Standard energy+force matching loss for a differentiable potential.

    potential_fn(positions, box, pairs, params) -> scalar energy.
    Batch entries: (positions, box, pairs, target_energy, target_forces).
    """

    def loss(params, batch):
        def one(positions, box, pairs, e_ref, f_ref):
            energy, de_dpos = jax.value_and_grad(
                lambda pos: potential_fn(pos, box, pairs, params)
            )(positions)
            forces = -de_dpos
            e_term = (energy - e_ref) ** 2
            f_term = jnp.mean((forces - f_ref) ** 2)
            return energy_weight * e_term + force_weight * f_term

        losses = [one(*entry) for entry in batch]
        return jnp.mean(jnp.stack(losses))

    return loss


def fit(
    loss_fn: Callable,
    params0: dict,
    batches,
    optimizer=None,
    n_epochs: int = 1,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    log_fn: Callable = print,
    log_every: int = 10,
) -> FitResult:
    """Run an optax fitting loop.

    Args:
      loss_fn: (params, batch) -> scalar.
      params0: initial differentiable parameter pytree.
      batches: iterable (re-iterated per epoch) of batch objects.
      optimizer: optax GradientTransformation (default adam(1e-3)).
      checkpoint_dir/checkpoint_every: orbax checkpointing of
        (params, opt_state); resumes automatically if a checkpoint exists.
    """
    import optax

    optimizer = optimizer or optax.adam(1e-3)
    opt_state = optimizer.init(params0)
    params = params0
    start_step = 0

    if checkpoint_dir:
        restored, step = restore_checkpoint(
            checkpoint_dir, {"params": params, "opt_state": opt_state}
        )
        if restored is not None:
            params, opt_state = restored["params"], restored["opt_state"]
            start_step = step
            log_fn(f"resumed from checkpoint at step {step}")

    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    step = start_step
    for _ in range(n_epochs):
        for batch in batches:
            t0 = time.perf_counter()
            params, opt_state, loss = train_step(params, opt_state, batch)
            loss = float(loss)
            step += 1
            history.append({"step": step, "loss": loss,
                            "dt": time.perf_counter() - t0})
            if log_every and step % log_every == 0:
                log_fn(f"step {step}: loss {loss:.6e}")
            if checkpoint_dir and checkpoint_every and step % checkpoint_every == 0:
                save_checkpoint(
                    checkpoint_dir, {"params": params, "opt_state": opt_state}, step
                )
    if checkpoint_dir and checkpoint_every:
        save_checkpoint(
            checkpoint_dir, {"params": params, "opt_state": opt_state}, step
        )
    return FitResult(params=params, history=history, steps=step)
