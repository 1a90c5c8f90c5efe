"""Checkpoint/resume via Orbax.

The reference only ever saves (`torch.save` of best/periodic state,
train_gde.py:523-528; RL dicts, run_gnode.py:1518-1526) and never resumes
(SURVEY.md §5). Here save AND restore are first-class: params, optimizer
state, RNG key, and step counter round-trip, so any training loop is
resumable after preemption.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        if ocp is None:
            raise ImportError("orbax-checkpoint is required")
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Dict[str, Any], force: bool = False):
        """state: pytree dict, e.g. {'params':…, 'opt_state':…, 'key':…}.

        force=True also OVERWRITES an existing checkpoint at `step` —
        orbax's own force flag bypasses save policies but still raises
        StepAlreadyExistsError (hit when a fresh run reuses a previous
        run's checkpoint_dir), so the stale step is deleted first."""
        if force and step in (self._mgr.all_steps() or []):
            self._mgr.delete(step)
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Dict[str, Any], step: Optional[int] = None,
                partial: bool = False):
        """Restore into the structure of `state_like` (same treedef/shapes).
        `partial=True` restores only the keys present in `state_like` (e.g.
        params-only from a full training checkpoint). Returns None if no
        checkpoint exists."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        target = jax.tree.map(np.asarray, state_like)
        if partial:
            return self._mgr.restore(
                step,
                args=ocp.args.PyTreeRestore(target, partial_restore=True),
            )
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(target)
        )

    def close(self):
        self._mgr.close()
