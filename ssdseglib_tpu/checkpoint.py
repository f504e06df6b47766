"""Checkpointing: Orbax step-level save/restore.

The reference persists only a single post-training whole-model `.keras`
save (reference notebook 03 cell 17) — a crash loses all 105 epochs.
Here training state (params, BN stats, optimizer state, step) checkpoints
at step granularity with retention, and restore resumes mid-run.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


class Checkpointer:
    """Thin wrapper over orbax.checkpoint for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        """Queue an async save.  Orbax serializes in the background so the
        training loop keeps stepping; the write is fenced at the next
        `latest_step`/`restore`/`close` (or an explicit
        `wait_until_finished`), not on the hot path."""
        import orbax.checkpoint as ocp

        self._manager.save(step, args=ocp.args.StandardSave(state))

    def wait_until_finished(self) -> None:
        self._manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._manager.wait_until_finished()
        return self._manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp

        self._manager.wait_until_finished()
        step = step if step is not None else self._manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def close(self) -> None:
        self._manager.wait_until_finished()
        self._manager.close()


def save_params_npz(path: str, variables: Any) -> None:
    """Flat .npz export of a variables pytree (portable, human-inspectable)."""
    import numpy as np

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        name = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in keypath
        )
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str, template: Any) -> Any:
    """Restore a variables pytree from a flat .npz written by
    `save_params_npz` (shapes/dtypes validated against the template)."""
    import numpy as np

    data = np.load(path)
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(template)
    flat, treedef = jax.tree_util.tree_flatten(template)
    restored = []
    for (keypath, leaf) in leaves_with_paths[0]:
        name = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in keypath
        )
        arr = data[name]
        if arr.shape != leaf.shape:
            raise ValueError(f"{name}: shape {arr.shape} != {leaf.shape}")
        restored.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, restored)
