"""Orbax checkpointing with the reference's snapshot semantics.

The reference saves ``{epoch, state_dict, optimizer, scheduler, best_loss}``
periodically and keeps ``model_best_loss.pth`` / ``model_best_acc.pth`` on
validation improvement (reference: trainer.py:48-55,197-210); eval loads
``model_best_acc.pth`` (reference: test.py:181). Resume restores
model/optimizer/epoch (reference: trainer.py:212-225 — minus the stray
``pdb.set_trace()``).

Here a snapshot is an Orbax PyTree checkpoint of the full TrainState plus a
JSON sidecar (epoch, best metrics) and the config JSON — the source-code
snapshotting of the reference (training_3DMatch.py:27-37) is replaced by
config-only reproducibility since the architecture is config-derived.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import orbax.checkpoint as ocp

from d3feat_tpu.train.step import TrainState

BEST_ACC = "model_best_acc"
BEST_LOSS = "model_best_loss"


class SnapshotManager:
    """Directory of named snapshots: periodic + best-loss + best-acc."""

    def __init__(self, directory: str, config=None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        if config is not None:
            config.to_json(os.path.join(self.directory, "config.json"))

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: TrainState, *, epoch: int,
             best_loss: float = float("inf"), best_acc: float = 0.0,
             overwrite: bool = True) -> None:
        path = self._path(name)
        if overwrite and os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._ckpt.save(path, dict(state._asdict()))
        self._ckpt.wait_until_finished()
        with open(path + ".meta.json", "w") as f:
            json.dump(
                {"epoch": epoch, "best_loss": best_loss, "best_acc": best_acc},
                f,
            )

    def restore(self, name: str, template: TrainState
                ) -> Tuple[TrainState, dict]:
        path = self._path(name)
        restored = self._ckpt.restore(path, dict(template._asdict()))
        meta = {"epoch": 0, "best_loss": float("inf"), "best_acc": 0.0}
        meta_path = path + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta.update(json.load(f))
        return TrainState(**restored), meta

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))

    def latest_periodic(self) -> Optional[str]:
        snaps = [
            d for d in os.listdir(self.directory)
            if d.startswith("snapshot_epoch_")
            and os.path.isdir(self._path(d))
        ]
        if not snaps:
            return None
        return max(snaps, key=lambda d: int(d.rsplit("_", 1)[1]))
