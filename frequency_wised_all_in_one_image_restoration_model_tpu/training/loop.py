"""The two-phase training loop (reference train.py:21-164).

Structure preserved: phase A (epoch < epochs_encoder) trains the contrastive
encoder only; phase B trains the joint objective; per-epoch loss lines go to
``train.log``; from phase B on, every epoch runs the full per-task eval and
appends to ``results.log`` (train.py:131-140); the LR staircase is applied
at epoch boundaries (train.py:142-149); a checkpoint lands at the final
epoch (train.py:120-129) — plus (new) optional periodic checkpoints with
full state for real resume.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..evaluation import runner as eval_runner
from ..models.airnet import ModelBundle, build_models
from ..parallel import mesh as mesh_lib
from ..utils.logging import RunLogs
from . import checkpoint as ckpt_lib
from .state import TrainState, create_train_state, lr_for_epoch, with_learning_rate
from .steps import array_batch, jit_train_steps


def build_train_loader(cfg: Config, seed: int = 0, prefetch: bool = False):
    if cfg.synthetic_data:
        from ..data.synthetic import SyntheticTrainLoader
        loader = SyntheticTrainLoader(cfg, seed=seed)
    else:
        from ..data.datasets import FileTrainLoader
        loader = FileTrainLoader(cfg, seed=seed)
    if prefetch:
        from ..data.prefetch import Prefetcher
        loader = Prefetcher(loader)
    return loader


def eval_variables(state: TrainState):
    """Assemble eval-mode variable dicts from train state (query encoder +
    its running stats; reference eval uses encoder_q, moco.py:167-170)."""
    enc_vars = {"params": state.params["encoder"], **state.extra["encoder"]}
    dec_vars = {"params": state.params["decoder"], **state.extra["decoder"]}
    return enc_vars, dec_vars


def concat_batches(batches):
    """Concatenate loader batches along the batch axis (array fields) to
    build the global batch for a ``mesh_data``-wide mesh; list fields (image
    names) concatenate as lists."""
    out = {}
    for k, v in batches[0].items():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            out[k] = np.concatenate([np.asarray(b[k]) for b in batches], 0)
        elif isinstance(v, list):
            out[k] = sum((b[k] for b in batches), [])
        else:
            out[k] = v
    return out


def run_training(cfg: Config, startpoint: int = 0,
                 progress: Optional[Callable[[int, Dict], None]] = None) -> TrainState:
    """Full training run. Returns the final state.

    Multi-device/multi-host: with ``mesh_data * mesh_task > 1`` the step
    runs SPMD over a global ``('data','task')`` mesh — state replicated,
    batch sharded; with ``--coordinator_address`` set each process first
    joins the jax.distributed cluster and feeds its process-local slice of
    the global batch (SURVEY.md §5.8; parallel/distributed.py).
    """
    from ..config import check_uformer_window_compat
    check_uformer_window_compat(cfg)  # fail fast, not at first eval
    from ..parallel import distributed as dist_lib
    dist_lib.initialize(cfg)
    is_main = jax.process_index() == 0

    logs = RunLogs(cfg) if is_main else None
    bundle = build_models(cfg)
    loader = build_train_loader(cfg, seed=cfg.seed, prefetch=True)

    n_mesh = cfg.mesh_data * cfg.mesh_task
    mesh = mesh_lib.make_mesh(cfg.mesh_data, cfg.mesh_task) if n_mesh > 1 else None

    def next_global_batch():
        if mesh is None or cfg.mesh_data == 1:
            return loader.next_batch()
        return concat_batches([loader.next_batch()
                               for _ in range(cfg.mesh_data)])

    rng = jax.random.PRNGKey(cfg.seed)
    first = next_global_batch()
    state = create_train_state(cfg, bundle, rng, first)
    if startpoint > 0:
        state = ckpt_lib.restore(cfg.ckpt_path, startpoint, state)
    if mesh is not None:
        state = mesh_lib.replicate_tree(state, mesh)

    enc_step, joint_step = jit_train_steps(cfg, bundle)

    steps_per_epoch = (cfg.steps_per_epoch if cfg.steps_per_epoch is not None
                       else getattr(loader, "steps_per_epoch", lambda: 400)())
    print("loading %s data pairs in total." % str(
        getattr(loader, "total_pairs", lambda: steps_per_epoch * len(cfg.de_type))()))
    print("Start training...")

    from ..utils.profiling import StepMeter
    meter = StepMeter(batch=cfg.batch_size, patch=cfg.patch_size, every=100)
    retention = ckpt_lib.RetentionPolicy(cfg.ckpt_path, every=cfg.ckpt_every)

    multihost = jax.process_count() > 1

    def shard(b):
        if mesh is None:
            return b
        from ..parallel import distributed as dist
        return dist.shard_global_batch(b, mesh)

    def local_vars(tree):
        # eval runs as a plain local jit; under multi-host the replicated
        # global arrays must be pulled to host first (the local replica)
        if not multihost:
            return tree
        return jax.tree_util.tree_map(np.asarray, tree)

    eval_fn = None
    for epoch in range(cfg.epochs):
        if epoch >= startpoint:
            state = with_learning_rate(state, lr_for_epoch(cfg, epoch))
            step_fn = enc_step if epoch < cfg.epochs_encoder else joint_step
            m = {}
            for _ in range(steps_per_epoch):
                state, m = step_fn(state, shard(array_batch(next_global_batch())))
                stats = meter.step()
                if stats and is_main:
                    print("  throughput: %.2f steps/s, %.1f samples/s" % (
                        stats["steps_per_sec"], stats["samples_per_sec"]))

            # numerics tripwire: the fused kernels' default static softmax
            # shift (exp(l-16), FAIRM_STATIC_SHIFT) is fp32-safe only while
            # logits stay <= ~104; LN'd activations keep them 1-2 orders
            # below that, but logit scale can drift over a long run. Fail
            # loudly at the epoch boundary (values are fetched here anyway
            # — zero extra syncs) instead of NaN-ing silently.
            for k in ("loss", "l1_loss", "contrast_loss"):
                if k in m and not np.isfinite(float(m[k])):
                    raise FloatingPointError(
                        f"non-finite {k}={float(m[k])} at epoch {epoch}. "
                        "If logits overflowed the static softmax shift, "
                        "rerun with FAIRM_STATIC_SHIFT=off (per-row max "
                        "subtraction) and restart from the last checkpoint.")

            if logs is not None:
                if epoch < cfg.epochs_encoder:
                    logs.log_epoch_encoder(epoch, float(m["contrast_loss"]))
                else:
                    logs.log_epoch_joint(epoch, float(m["l1_loss"]),
                                         float(m["contrast_loss"]))
            if progress is not None:
                progress(epoch, {k: float(v) for k, v in m.items()})

            # Checkpoint saves run on EVERY process: Orbax save performs
            # multihost sync barriers when process_count > 1, so gating the
            # call to process 0 deadlocks at the first checkpoint (ADVICE
            # r2). Orbax gates the actual disk writes to the primary host.
            if epoch + 1 == cfg.epochs:
                ckpt_lib.save(cfg.ckpt_path, epoch + 1,
                              jax.tree_util.tree_map(np.asarray, state))

            mean_psnr = None
            if epoch >= cfg.epochs_encoder and is_main:
                logs.log_results_header(epoch + 1)
                enc_vars, dec_vars = eval_variables(state)
                enc_vars, dec_vars = local_vars(enc_vars), local_vars(dec_vars)
                if eval_fn is None:
                    eval_fn = eval_runner.make_eval_fn(bundle)
                psnrs = []
                for task in cfg.test_de_type:
                    result = eval_runner.test_by_task(
                        cfg, bundle, enc_vars, dec_vars, task,
                        epochs=epoch + 1, eval_fn=eval_fn,
                        mesh=mesh if cfg.mesh_data > 1 and not multihost
                        else None)
                    logs.log_result(task, result)
                    psnrs.append(float(result.split(": ")[1].split("/")[0]))
                mean_psnr = sum(psnrs) / len(psnrs) if psnrs else None

            if multihost and epoch >= cfg.epochs_encoder:
                # eval ran on process 0 only; broadcast its PSNR so every
                # process takes the same best-checkpoint branch (the save
                # inside is a collective — see above)
                from jax.experimental import multihost_utils
                v = float(multihost_utils.broadcast_one_to_all(
                    np.float32(np.nan if mean_psnr is None else mean_psnr)))
                mean_psnr = None if np.isnan(v) else v

            retention.maybe_save(
                epoch, jax.tree_util.tree_map(np.asarray, state)
                if multihost else state, mean_psnr)

    if logs is not None:
        logs.close()
    return state
