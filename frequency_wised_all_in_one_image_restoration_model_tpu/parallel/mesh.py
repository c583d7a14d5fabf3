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
MODEL_AXIS = "model"
MESH_AXES = BATCH_AXES + (MODEL_AXIS,)


def make_mesh(n_data: int = 0, n_task: int = 1, n_model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Build a ``('data','task','model')`` mesh. ``n_data=0`` -> use all
    remaining devices. The ``model`` axis is the tensor-parallel hook
    (SURVEY.md §2.4 TP row): size 1 in every production config — at
    embed_dim 28-896 TP buys nothing — but the sharding rules below are
    wired so a wider model axis shards the large Dense/Conv kernels."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if n_data == 0:
        n_data = len(devs) // (n_task * n_model)
    devs = devs[: n_data * n_task * n_model].reshape(n_data, n_task, n_model)
    return Mesh(devs, MESH_AXES)


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
    if jax.process_count() == 1:
        return jax.device_put(tree, rep)
    # multi-host: every process holds an identical copy (same seed, same
    # deterministic init); assemble global replicated arrays from the local
    # copies rather than device_put-ing across hosts
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            rep, np.asarray(a), np.shape(a)), tree)


def param_partition_spec(path, leaf, n_model: int,
                         min_dim: int = 128) -> P:
    """TP sharding rule for one parameter (SURVEY.md §2.4 TP hook).

    Dense kernels ``[in, out]`` and conv kernels ``[kh, kw, in, out]`` are
    column-parallel: the output-feature axis is sharded over ``model`` when
    it is divisible and at least ``min_dim`` wide (below that the collective
    overhead dwarfs the matmul). Everything else — biases, norms, tables,
    queues — is replicated. XLA inserts the all-gathers/reduce-scatters the
    layout implies.
    """
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    shape = getattr(leaf, "shape", ())
    if (n_model > 1 and name == "kernel" and len(shape) >= 2
            and shape[-1] % n_model == 0 and shape[-1] >= min_dim):
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def shard_params(params: Any, mesh: Mesh, min_dim: int = 128) -> Any:
    """Place a parameter pytree on the mesh under the TP rules above.

    With a size-1 ``model`` axis this is exactly :func:`replicate_tree`.
    """
    n_model = mesh.shape.get(MODEL_AXIS, 1)

    def place(path, leaf):
        spec = param_partition_spec(path, leaf, n_model, min_dim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


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
