"""Failure detection: finite-loss watchdog + emergency checkpointing.

The reference has no failure handling (SURVEY §5: crash = rerun with
resume). Here the train loop checks the scalar loss every display interval;
on NaN/Inf it saves an emergency checkpoint of the last-good state and raises
with context, so long unattended runs fail loudly and resumably.
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger("pea")


class NonFiniteLossError(RuntimeError):
    pass


class LossWatchdog:
    """Tracks recent losses; raises (after saving state) on NaN/Inf."""

    def __init__(self, save_dir: str | None = None, patience: int = 0):
        self.save_dir = save_dir
        self.patience = patience
        self._bad = 0
        self.last_good_state = None

    def check(self, loss: float, state=None, step: int = 0):
        if np.isfinite(loss):
            self._bad = 0
            self.last_good_state = state
            return
        self._bad += 1
        if self._bad > self.patience:
            if self.save_dir and self.last_good_state is not None:
                from ..train.checkpoint import save_checkpoint

                path = save_checkpoint(self.save_dir, self.last_good_state,
                                       step)
                log.error("non-finite loss at step %d; last good state "
                          "saved to %s", step, path)
            raise NonFiniteLossError(
                f"loss became non-finite ({loss}) at step {step}")
