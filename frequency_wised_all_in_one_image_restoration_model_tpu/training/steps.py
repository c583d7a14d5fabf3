"""Jitted train steps for the two training phases.

Reference call stack (train.py:73-96, SURVEY.md §3.1):
  phase A (epoch < epochs_encoder): contrastive loss only through MoCo;
  phase B: full AirNet — L1 (+ optional frequency-band L1) + weighted
  contrastive loss.

Each phase is its own jitted, state-donating function (a single compiled
program per phase beats a ``lax.cond`` over the whole decoder). Inside one
step, ordering matches MoCo exactly: EMA-update the key encoder with the
*pre-step* query params (moco.py:132), encode keys without gradients
(moco.py:131-136), compute per-band InfoNCE logits against queue negatives
(moco.py:141-156), then ring-enqueue the new keys (moco.py:164).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import moco
from ..models.airnet import ModelBundle
from . import losses
from .state import TrainState, make_optimizer


ARRAY_BATCH_KEYS = ("d1", "d2", "c1", "c2", "de_id")


def array_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Keep only the device-array fields of a loader batch (drops host-side
    metadata like image names, which cannot cross the jit boundary)."""
    return {k: batch[k] for k in ARRAY_BATCH_KEYS if k in batch}


def _apply_mutable(module, params, extra, *args, rngs=None, **kwargs):
    """Apply a module with whatever mutable collections it carries."""
    variables = {"params": params, **extra}
    keys = [k for k in extra.keys()]
    if keys:
        out, new_extra = module.apply(variables, *args, rngs=rngs,
                                      mutable=keys, **kwargs)
        return out, dict(new_extra)
    return module.apply(variables, *args, rngs=rngs, **kwargs), extra


def make_train_step(cfg: Config, bundle: ModelBundle, joint: bool,
                    upto: str = "full") -> Callable:
    """Build the (donatable) step for one phase. ``joint=False`` -> phase A.

    ``upto`` truncates the step for profiling (tools/train_probe.py
    --profile): "loss" stops after the forward (key branch + loss value,
    no gradient), "grads" stops after the backward (no optimizer/EMA
    state/queue update), "full" (default) is the real step. The truncated
    variants still thread the RNG through the carried state so a chained
    timing scan cannot hoist the loop-invariant computation."""
    assert upto in ("loss", "grads", "full")
    tx = make_optimizer(cfg)

    def step(state: TrainState, batch: Dict[str, jax.Array]
             ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, r_q, r_k, r_dec = jax.random.split(state.rng, 4)
        rngs_q = {"droppath": r_q, "dropout": r_q}
        rngs_k = {"droppath": r_k, "dropout": r_k}
        rngs_dec = {"droppath": r_dec, "dropout": r_dec}

        # --- key branch: EMA update then no-grad forward (moco.py:131-136)
        params_k = moco.momentum_update(state.moco.params_k,
                                        state.params["encoder"])
        (_, k_list, _), new_extra_k = _apply_mutable(
            bundle.encoder, params_k, state.moco.extra_k, batch["d2"],
            rngs=rngs_k, train=True)
        k = jax.lax.stop_gradient(moco.normalize_bands(k_list))

        def loss_fn(params):
            (_, q_list, inter), new_extra_enc = _apply_mutable(
                bundle.encoder, params["encoder"], state.extra["encoder"],
                batch["d1"], rngs=rngs_q, train=True)
            q = moco.normalize_bands(q_list)
            logits = moco.contrastive_logits(q, k, state.moco.queue)
            closs = moco.contrastive_loss(logits)

            if joint:
                restored, new_extra_dec = _apply_mutable(
                    bundle.decoder, params["decoder"], state.extra["decoder"],
                    batch["d1"], inter, rngs=rngs_dec, train=True)
                total, l1 = losses.restoration_loss(
                    cfg, restored, batch["c1"], closs)
            else:
                new_extra_dec = state.extra["decoder"]
                total, l1 = closs, jnp.zeros((), jnp.float32)

            new_extra = {"encoder": new_extra_enc, "decoder": new_extra_dec}
            return total, (closs, l1, new_extra)

        if upto == "loss":
            loss, (closs, l1, _) = loss_fn(state.params)
            return (state.replace(step=state.step + 1, rng=rng),
                    {"loss": loss, "contrast_loss": closs, "l1_loss": l1})

        (loss, (closs, l1, new_extra)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        if upto == "grads":
            # gnorm is the fetched scalar (train_probe sums it), so the
            # backward cannot be dead-code-eliminated from the chain
            return (state.replace(step=state.step + 1, rng=rng),
                    {"loss": loss, "contrast_loss": closs, "l1_loss": l1,
                     "gnorm": optax.global_norm(grads)})

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        queue, ptr = moco.dequeue_and_enqueue(
            state.moco.queue, state.moco.queue_ptr, k)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            extra=new_extra,
            moco=state.moco.replace(params_k=params_k, extra_k=new_extra_k,
                                    queue=queue, queue_ptr=ptr),
            opt_state=new_opt_state,
            rng=rng,
        )
        metrics = {"loss": loss, "contrast_loss": closs, "l1_loss": l1}
        return new_state, metrics

    return step


def jit_train_steps(cfg: Config, bundle: ModelBundle):
    """Jitted (encoder_step, joint_step) with donated state buffers."""
    enc_step = jax.jit(make_train_step(cfg, bundle, joint=False),
                       donate_argnums=(0,))
    joint_step = jax.jit(make_train_step(cfg, bundle, joint=True),
                         donate_argnums=(0,))
    return enc_step, joint_step
