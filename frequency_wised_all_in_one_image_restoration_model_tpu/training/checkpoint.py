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


def save(ckpt_path: str, epoch: int, state: TrainState) -> str:
    path = _ckpt_dir(ckpt_path, epoch)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, state), force=True)
    return path


def restore(ckpt_path: str, epoch: int, template: TrainState) -> TrainState:
    path = _ckpt_dir(ckpt_path, epoch)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=jax.tree_util.tree_map(np.asarray, template))
    return jax.tree_util.tree_map(lambda t, r: jax.numpy.asarray(r),
                                  template, restored)


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
