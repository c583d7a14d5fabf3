"""Multi-host SPMD wiring (SURVEY.md §5.8).

The reference's only distributed artifacts are MoCo's dead DDP helpers —
``concat_all_gather`` / batch shuffle referenced from moco.py:52-113 with
the single call site commented out (moco.py:55). Here multi-host training
is real and TPU-native:

* ``initialize(cfg)`` calls :func:`jax.distributed.initialize` once per
  process (coordinator + process grid from the config/flags), after which
  ``jax.devices()`` spans the whole slice and the global
  ``('data','task','model')`` mesh is built over it;
* every process materializes only its **process-local slice** of the global
  batch; :func:`shard_global_batch` assembles the global jax.Arrays with
  :func:`jax.make_array_from_process_local_data` — XLA then runs one SPMD
  program, gradients reduce over ICI/DCN via the psum the global-mean loss
  implies, and the MoCo queue enqueue of the globally-shaped key batch is
  the all-gather the reference commented out.

Data feeding contract: loaders are seeded identically on every host and
generate the GLOBAL batch deterministically; :func:`process_slice` picks the
rows this host owns. (For the file loader this costs no extra decoding: the
slice is taken before image loading via ``local_indices``.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

from . import mesh as mesh_lib


_initialized = False


def initialize(cfg=None, coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Start the JAX distributed runtime (idempotent, no-op single-host)."""
    global _initialized
    if cfg is not None:
        coordinator_address = cfg.coordinator_address
        num_processes = cfg.num_processes
        process_id = cfg.process_id
    if not coordinator_address or (num_processes or 1) <= 1:
        return
    if _initialized:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True


def process_slice(n_global: int) -> slice:
    """Rows of the global batch this process owns (contiguous block;
    the mesh is built from ``jax.devices()`` which orders devices by
    process, so a contiguous block matches the sharding layout)."""
    nproc = jax.process_count()
    if n_global % nproc != 0:
        raise ValueError(f"global batch {n_global} not divisible by "
                         f"{nproc} processes")
    per = n_global // nproc
    lo = per * jax.process_index()
    return slice(lo, lo + per)


def shard_global_batch(batch: Dict[str, Any], mesh) -> Dict[str, Any]:
    """Global numpy batch (every host sees the same) -> global jax.Arrays
    sharded over the mesh batch axes, each host contributing only its
    process-local slice. Single-process: plain device_put (identical)."""
    sh = mesh_lib.batch_sharding(mesh)
    if jax.process_count() == 1:
        return mesh_lib.shard_batch(batch, mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and getattr(v, "ndim", 0) >= 1:
            v = np.asarray(v)
            sl = process_slice(v.shape[0])
            out[k] = jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(v[sl]), v.shape)
        else:
            out[k] = v
    return out
