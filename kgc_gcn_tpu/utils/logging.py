"""Logging + small observability helpers.

Two-sink logging (console + ``<model_dir>/train.log``) with the reference's
format (reference utils.py:80-104), guarded to host 0 under multi-host JAX.
"""

from __future__ import annotations

import logging
import os

import jax


def is_host_zero() -> bool:
    return jax.process_index() == 0


def set_logger(log_path: str) -> None:
    """Root logger → console + file, '%(asctime)s [%(levelname)s]' format."""
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    if logger.handlers:
        return
    fmt = logging.Formatter("%(asctime)s [%(levelname)s] %(message)s")
    if is_host_zero():
        os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
        fh = logging.FileHandler(log_path)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    # orbax's async-save worker logs several INFO lines per checkpoint; keep
    # the training log at the reference's signal level (metric/epoch lines)
    logging.getLogger("absl").setLevel(logging.WARNING)
    for name in ("orbax", "orbax.checkpoint"):
        logging.getLogger(name).setLevel(logging.WARNING)


class RunningAverage:
    """Streaming mean (reference utils.py:41-61)."""

    def __init__(self):
        self.steps = 0
        self.total = 0.0

    def update(self, val: float) -> None:
        self.total += float(val)
        self.steps += 1

    def __call__(self) -> float:
        return self.total / float(self.steps)
