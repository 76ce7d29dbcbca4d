"""TensorBoard scalar/image logging with a CSV fallback.

Mirrors the reference's SummaryWriter usage (train.py:31,60-82). The
writer is host-side-only and lazily imported; if no TensorBoard backend is
importable, scalars fall back to a CSV file so headless runs still record
training curves.
"""

from __future__ import annotations

import csv
import os
import time


class Logger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # host-only

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass
        self._csv_path = os.path.join(log_dir, "scalars.csv")
        self._csv = open(self._csv_path, "a", newline="")
        self._writer = csv.writer(self._csv)

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._writer.writerow([time.time(), step, tag, float(value)])
        self._csv.flush()

    def images(self, tag: str, imgs, step: int) -> None:
        """imgs: (N, H, W, C) float array in [0, 1]."""
        if self._tb is not None:
            self._tb.add_images(tag, imgs, global_step=step, dataformats="NHWC")

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._csv.close()


def run_log_dir(base: str = "logs") -> str:
    """Reference-style run dir: logs/run_<ts> (train.py:31)."""
    return os.path.join(base, f"run_{str(time.time())[-10:]}")
