"""Device mesh and sharding rules.

The reference has no working parallelism: single CUDA device, dead DDP
helpers in MoCo (SURVEY.md §2.4). Here data parallelism is first-class and
comes from SPMD partitioning, not from translating NCCL calls:

* mesh axes ``('data', 'task')`` — the batch is one sample per degradation
  task (option.py:76), so the natural scaling axes are more samples per task
  (``data``) and the task dimension itself (``task``). Both shard the batch's
  leading axis; they are separate axes so sweeps/pods can map them onto
  different ICI dimensions.
* model/optimizer/MoCo state is replicated (the models are tiny relative to
  HBM; there is nothing to gain from TP at embed_dim 28-896). Gradients are
  reduced by XLA-inserted ``psum`` because the loss is a global mean over the
  sharded batch.
* MoCo's queue enqueue consumes the *globally shaped* key batch, which is
  precisely the all-gather the reference commented out (moco.py:55) — XLA
  inserts the collective.
* BatchNorm statistics become global-batch statistics for free (the mean
  reduces over a sharded axis), i.e. sync-BN — removing the motivation for
  MoCo's DDP batch-shuffle (moco.py:68-113).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXES = ("data", "task")


def make_mesh(n_data: int = 0, n_task: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Build a ``('data','task')`` mesh. ``n_data=0`` -> use all devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if n_data == 0:
        n_data = len(devs) // n_task
    devs = devs[: n_data * n_task].reshape(n_data, n_task)
    return Mesh(devs, BATCH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over both mesh axes."""
    return NamedSharding(mesh, P(BATCH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place numpy batch arrays on the mesh, batch axis sharded."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.device_put(tree, rep)


def tile_batch(batch: Dict[str, Any], factor: int) -> Dict[str, Any]:
    """Grow the batch by repeating samples (e.g. to reach a multiple of the
    mesh size when the task count alone is smaller)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            out[k] = np.concatenate([v] * factor, axis=0)
        elif isinstance(v, list):
            out[k] = v * factor
        else:
            out[k] = v
    return out
