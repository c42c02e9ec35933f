"""Checkpoint/resume for fitting runs (orbax-backed).

The reference has no checkpointing at all (SURVEY.md section 5); its only
persistent state is the SCF warm-start attribute. Here any pytree —
(params, optimizer state, induced dipoles, step counter) — can be saved and
restored atomically.
"""

from __future__ import annotations

import pathlib

import jax


def save_checkpoint(directory, state, step: int):
    """Save a pytree checkpoint under directory/step."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(directory).absolute() / f"step_{step:08d}"
    with ocp.StandardCheckpointer() as ckptr:
        # force=True: re-saving the same step (e.g. right after a resume)
        # overwrites atomically instead of crashing
        ckptr.save(path, state, force=True)
    return str(path)


def restore_checkpoint(directory, template, step: int | None = None):
    """Restore the latest (or a specific) checkpoint as the given pytree
    structure. Returns (state, step) or (None, None) when absent."""
    import orbax.checkpoint as ocp

    root = pathlib.Path(directory).absolute()
    if not root.exists():
        return None, None
    steps = sorted(
        int(p.name.split("_")[1]) for p in root.glob("step_*") if p.is_dir()
    )
    if not steps:
        return None, None
    chosen = step if step is not None else steps[-1]
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(
            root / f"step_{chosen:08d}",
            jax.tree_util.tree_map(lambda x: x, template),
        )
    return state, chosen
