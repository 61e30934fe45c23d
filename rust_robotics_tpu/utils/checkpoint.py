"""Checkpoint/resume for long-running filter and optimizer state.

Reference has NONE (SURVEY.md §2.12 last row) — this is new TPU-first
architecture: orbax checkpoints of arbitrary pytrees (filter banks,
training state, particle clouds) so multi-hour replays survive preemption.
"""

from __future__ import annotations

import os


def save_checkpoint(directory, step: int, state):
    """Write pytree `state` at `directory/step_N` (orbax StandardSave)."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(str(directory)), f"step_{step}")
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, state)
    return path


def load_checkpoint(directory, step: int, like):
    """Restore the pytree saved at step N, with `like` as the structure/
    shape template (abstract target)."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(str(directory)), f"step_{step}")
    template = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(path, template)


def latest_step(directory):
    """Largest step_N present, or None."""
    if not os.path.isdir(directory):
        return None
    steps = [
        int(name.split("_", 1)[1])
        for name in os.listdir(directory)
        if name.startswith("step_") and name.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None
