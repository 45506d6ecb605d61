"""Checkpointing: orbax-backed save/restore of the FULL train state.

The reference saves model weights only — latest.pth every eval plus
{model}_best_model.pth on val improvement (train_ours_2D.py:428-435) — with no
optimizer state, step counter, or resume path. This rebuild checkpoints the
complete TrainState (params + BN stats + optimizer momentum + GradSim scores +
step) under the same latest/best layout, so interrupted runs resume exactly
(SURVEY.md §5 gap-fill).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

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
        try:
            restored = self._ckptr.restore(self._slot(name),
                                           fser.to_state_dict(template))
        except BaseException:
            # legacy layout fallback: snapshots written before the state-dict
            # switch stored the raw TrainState pytree (tuples and all); retry
            # with the raw template so old run directories stay restorable
            return self._ckptr.restore(self._slot(name), template)
        return fser.from_state_dict(template, restored)

    def has(self, name: str) -> bool:
        return os.path.isdir(self._slot(name))

    def restore_latest(self, template: Any) -> Optional[Any]:
        if self.has("latest"):
            return self.restore("latest", template)
        return None

    # -- run metadata sidecar (meta.json next to the slots) ------------------
    # The best-val metric lives OUTSIDE the orbax tree on purpose: adding a
    # field to the TrainState would change the on-disk template and break
    # restores of older snapshots (the round-2 layout-compat lesson). A plain
    # JSON sidecar is layout-neutral and trivially forward-compatible.

    def _meta_path(self) -> str:
        return os.path.join(self.root, "meta.json")

    def save_meta(self, meta: Dict[str, Any]) -> None:
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    def load_meta(self) -> Dict[str, Any]:
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                return json.load(f)
        return {}
