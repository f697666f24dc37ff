"""Checkpointing: orbax-backed save/restore with best-PSNR tracking.

Replaces the reference's ``torch.save({'epoch','state_dict','optimizer'})``
flow (``/root/reference/train.py:168-183``): ``model_best`` on PSNR
improvement, periodic ``model_{epoch}`` snapshots, resume restoring params,
optimizer state AND step (the reference's resume drops optimizer moments —
``RawFomer_WFB_FFAB/train.py:129-131`` — which we deliberately fix).
Async saves keep the TPU busy while the host serialises.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, metrics: Optional[dict] = None) -> None:
        if step in self._mgr.all_steps():
            return  # already saved this epoch (e.g. best + periodic coincide)
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics=metrics,
            force=True,
        )

    def restore(self, state_template, step: Optional[int] = None):
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


class BestTracker:
    """Tracks best validation PSNR and its epoch (train.py:165-172)."""

    def __init__(self):
        self.best_psnr = -np.inf
        self.best_epoch = -1

    def update(self, epoch: int, psnr: float) -> bool:
        if psnr > self.best_psnr:
            self.best_psnr = float(psnr)
            self.best_epoch = int(epoch)
            return True
        return False
