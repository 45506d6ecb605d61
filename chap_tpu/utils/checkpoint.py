"""Checkpointing: orbax-backed save/restore of the FULL train state.

The reference saves model weights only — latest.pth every eval plus
{model}_best_model.pth on val improvement (train_ours_2D.py:428-435) — with no
optimizer state, step counter, or resume path. This rebuild checkpoints the
complete TrainState (params + BN stats + optimizer momentum + GradSim scores +
step) under the same latest/best layout, so interrupted runs resume exactly
(SURVEY.md §5 gap-fill).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """latest/best two-slot checkpointing in <snapshot>/checkpoints."""

    def __init__(self, snapshot_path: str):
        self.root = os.path.abspath(os.path.join(snapshot_path, "checkpoints"))
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _slot(self, name: str) -> str:
        return os.path.join(self.root, name)

    def save(self, name: str, state: Any) -> None:
        # serialize through flax's state-dict view: pure nested dicts, no
        # tuples/lists/custom nodes — orbax's structural matching treats a
        # tuple-in-template vs list-on-disk as an error (observed flaking on
        # TrainState.sim_scores), and from_state_dict restores the template's
        # own container types on the way back.
        import flax.serialization as fser
        path = self._slot(name)
        self._ckptr.save(path, fser.to_state_dict(state), force=True)
        self._ckptr.wait_until_finished()

    def save_latest(self, state: Any) -> None:
        self.save("latest", state)

    def save_best(self, state: Any) -> None:
        self.save("best", state)

    def restore(self, name: str, template: Any) -> Any:
        import flax.serialization as fser
        restored = self._ckptr.restore(self._slot(name),
                                       fser.to_state_dict(template))
        return fser.from_state_dict(template, restored)

    def has(self, name: str) -> bool:
        return os.path.isdir(self._slot(name))

    def restore_latest(self, template: Any) -> Optional[Any]:
        if self.has("latest"):
            return self.restore("latest", template)
        return None
