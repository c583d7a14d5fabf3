"""Checkpoint/resume via Orbax.

Upgrades over the reference (SURVEY.md §5.4): the reference saves a bare
``state_dict`` only at the final epoch and discards the optimizer state it
just built (train.py:120-129); resume is a hard-coded ``startpoint`` that
reloads params only (train.py:58-60). Here the FULL train state — params,
MoCo key encoder + queue, optimizer moments, RNG, step — round-trips, at a
configurable cadence, with the reference's ``epoch_<N>`` naming kept for CLI
familiarity.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _ckpt_dir(ckpt_path: str, epoch: int) -> str:
    return os.path.abspath(os.path.join(ckpt_path, f"epoch_{epoch}"))


def _save_tree(path: str, state: TrainState) -> None:
    # force=True gives overwrite semantics with Orbax handling the deletion
    # (on the primary host, with sync) — a manual pre-rmtree on process 0
    # would race the other processes' save in multi-host runs. EVERY process
    # must call this: Orbax save runs sync_global_processes barriers when
    # jax.process_count() > 1, so gating the call to process 0 deadlocks
    # training at the first checkpoint (ADVICE r2).
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, state),
                   force=True)
    # StandardCheckpointer saves are async; the context-manager exit above
    # waits for completion, so the checkpoint is durable on return.


def save(ckpt_path: str, epoch: int, state: TrainState) -> str:
    path = _ckpt_dir(ckpt_path, epoch)
    _save_tree(path, state)
    return path


def restore(ckpt_path: str, epoch: int, template: TrainState) -> TrainState:
    path = _ckpt_dir(ckpt_path, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            path, jax.tree_util.tree_map(np.asarray, template))
    return jax.tree_util.tree_map(lambda t, r: jax.numpy.asarray(r),
                                  template, restored)


def has_epoch(ckpt_path: str, epoch: int) -> bool:
    return os.path.isdir(_ckpt_dir(ckpt_path, epoch))


def select_eval_epoch(ckpt_path: str, requested: int) -> Optional[int]:
    """Pick the checkpoint epoch for evaluation: the requested epoch when
    ``ckpt/epoch_<requested>`` exists (reference test.py:92-94 evaluates the
    named epoch), else the newest one, else None (no checkpoints at all)."""
    if has_epoch(ckpt_path, requested):
        return requested
    return latest_epoch(ckpt_path)


def latest_epoch(ckpt_path: str) -> Optional[int]:
    if not os.path.isdir(ckpt_path):
        return None
    epochs = []
    for name in os.listdir(ckpt_path):
        if name.startswith("epoch_"):
            try:
                epochs.append(int(name.split("_")[1]))
            except ValueError:
                pass
    return max(epochs) if epochs else None


class RetentionPolicy:
    """Keep the last N periodic checkpoints plus the best-PSNR one
    (SURVEY.md §5.4 plan; the reference keeps only the final epoch)."""

    def __init__(self, ckpt_path: str, every: int = 0, keep: int = 2):
        self.ckpt_path = ckpt_path
        self.every = every
        self.keep = keep
        self.best_psnr = -float("inf")
        self.saved: list[int] = []

    def maybe_save(self, epoch: int, state: TrainState,
                   mean_psnr: Optional[float] = None) -> Optional[str]:
        import shutil

        path = None
        if self.every and (epoch + 1) % self.every == 0:
            path = save(self.ckpt_path, epoch + 1, state)
            self.saved.append(epoch + 1)
            while len(self.saved) > self.keep:
                old = self.saved.pop(0)
                if jax.process_index() == 0:
                    shutil.rmtree(_ckpt_dir(self.ckpt_path, old),
                                  ignore_errors=True)
        if mean_psnr is not None and mean_psnr > self.best_psnr:
            self.best_psnr = mean_psnr
            best = os.path.join(os.path.abspath(self.ckpt_path), "best")
            _save_tree(best, state)
            path = best
        return path
