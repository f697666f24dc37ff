"""Metrics/observability surface.

One interface covering the reference's scattered sinks (SURVEY.md §5):
  * append-mode text log with the epoch line format of
    ``/root/reference/train.py:175``;
  * TensorBoard scalars (valid_PSNR, best_PSNR, best_epoch, epoch_time,
    epoch_loss, epoch_LR — ``RawFomer_WFB_FFAB/train.py:226-233``);
  * per-image PSNR/SSIM CSV (``test.py:141-143``).

TensorBoard writing uses tf.summary when TensorFlow is importable and
degrades to a no-op otherwise.
"""

from __future__ import annotations

import datetime
import os
from typing import Dict, Optional, Sequence


class MetricsLogger:
    def __init__(self, log_file: Optional[str] = None, tensorboard_dir: Optional[str] = None):
        self._log_f = None
        if log_file:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
            self._log_f = open(log_file, "a")
            self._log_f.write(
                f"\nTraining start time: {datetime.datetime.now().isoformat()}\n"
            )
        self._tb = None
        if tensorboard_dir:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except Exception:
                # Requested TB but can't deliver it — say so once instead of
                # silently producing an empty run directory.
                import warnings

                warnings.warn(
                    "tensorboard_dir=%r requested but TensorFlow is not "
                    "importable; TensorBoard logging is disabled (text/CSV "
                    "logging unaffected)." % tensorboard_dir,
                    RuntimeWarning,
                    stacklevel=2,
                )
                self._tb = None

    def log_epoch(
        self,
        epoch: int,
        total_epochs: int,
        epoch_time: float,
        loss: float,
        avg_psnr: float,
        best_psnr: float,
        best_epoch: int,
    ) -> None:
        line = (
            f"Epoch {epoch}/{total_epochs} | Time: {epoch_time:.2f}s | "
            f"Loss: {loss:.4f} | Avg PSNR: {avg_psnr:.4f} | "
            f"Best PSNR: {best_psnr:.4f} (Epoch {best_epoch})\n"
        )
        if self._log_f:
            self._log_f.write(line)
            self._log_f.flush()

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for name, value in scalars.items():
                    tf.summary.scalar(name, float(value), step=step)
                self._tb.flush()

    def write_metrics_csv(
        self, path: str, psnr_values: Sequence[float], ssim_values: Sequence[float]
    ) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            for p, s in zip(psnr_values, ssim_values):
                f.write(f"{p:.4f},{s:.4f}\n")

    def close(self) -> None:
        if self._log_f:
            self._log_f.write(
                f"Training finished at: {datetime.datetime.now().isoformat()}\n"
            )
            self._log_f.close()
            self._log_f = None
