"""Functional MoCo: momentum contrast as explicit, jit-friendly state.

The reference wraps every encoder in a stateful ``MoCo`` module
(net/utils/moco.py:6-170): a momentum-updated key encoder, a per-band
negative queue written in place through a ring pointer, and all-zero labels.
Under XLA those in-place, order-dependent semantics become explicit pure
functions over a :class:`MoCoState` pytree that lives in the train state and
is donated every step.

Distributed note: the reference commented out the all-gather that MoCo needs
under data parallelism (moco.py:55) and carried dead DDP batch-shuffle
helpers (moco.py:68-113). Here nothing special is required — the train step
is a single pjit-ed program over globally-shaped arrays, so enqueueing the
full key batch *is* the all-gather (XLA inserts the collective), and
BatchNorm statistics are global (sync-BN), removing the shuffle's reason to
exist.

Divergence (PARITY.md): ``num_losses`` equals the number of bands the chosen
encoder actually emits (L for the Uformer encoder, 1 for ResNet/ViT). The
reference always loops ``opt.L`` times (moco.py:20,127) and indexes out of
range for single-band encoders.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct


class MoCoState(struct.PyTreeNode):
    """Non-gradient MoCo state (key encoder + negative queue)."""

    params_k: Any            # EMA copy of encoder params (moco.py:33-35,44-50)
    extra_k: Any             # key-encoder mutable collections (its own BN stats)
    queue: jax.Array         # [num_losses, dim, K], L2-normalized columns
    queue_ptr: jax.Array     # int32 scalar ring pointer (moco.py:42)


def init_queue(rng: jax.Array, num_losses: int, dim: int, K: int) -> jax.Array:
    """randn then per-band L2-normalize along dim (moco.py:38-40)."""
    q = jax.random.normal(rng, (num_losses, dim, K), dtype=jnp.float32)
    return q / jnp.linalg.norm(q, axis=1, keepdims=True)


def init_state(rng: jax.Array, params_q: Any, extra_q: Any,
               num_losses: int, dim: int, K: int) -> MoCoState:
    """Key encoder starts as an exact copy of the query encoder
    (moco.py:33-35; parameters only — BN running stats evolve separately,
    torch ``parameters()`` never covered buffers)."""
    # real copies, not aliases: the whole train state is donated every step,
    # and XLA rejects donating the same buffer twice
    copy = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), t)
    return MoCoState(
        params_k=copy(params_q),
        extra_k=copy(extra_q),
        queue=init_queue(rng, num_losses, dim, K),
        queue_ptr=jnp.zeros((), jnp.int32),
    )


def momentum_update(params_k: Any, params_q: Any, m: float = 0.999) -> Any:
    """param_k <- m*param_k + (1-m)*param_q (moco.py:44-50)."""
    return jax.tree_util.tree_map(
        lambda k, q: k * m + q.astype(k.dtype) * (1.0 - m), params_k, params_q)


def normalize_bands(q: jax.Array) -> jax.Array:
    """L2-normalize [num_losses, B, dim] along dim (moco.py:127-128)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def contrastive_logits(q: jax.Array, k: jax.Array, queue: jax.Array,
                       T: float = 0.07) -> jax.Array:
    """Per-band InfoNCE logits.

    Args:
      q, k: normalized ``[num_losses, B, dim]``.
      queue: ``[num_losses, dim, K]``.
    Returns logits ``[num_losses, B, 1+K]`` (positive first — labels are all
    zeros, moco.py:141-161).
    """
    # fp32-pinned: JAX's default matmul precision truncates operands to
    # bf16 (on TPU *and* CPU), which perturbs the contrastive logits at the
    # 1e-3 level; these contractions are tiny, so exactness is free
    l_pos = jnp.einsum("lbc,lbc->lb", q, k,
                       precision=jax.lax.Precision.HIGHEST)[..., None]
    l_neg = jnp.einsum("lbc,lck->lbk", q, jax.lax.stop_gradient(queue),
                       precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([l_pos, l_neg], axis=-1) / T


def dequeue_and_enqueue(queue: jax.Array, ptr: jax.Array,
                        keys: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Ring-buffer write of the key batch at ``ptr`` (moco.py:52-66).

    ``keys: [num_losses, B, dim]``; requires ``K % B == 0`` (guaranteed by
    construction: K = 3 * batch_size, model.py:35). Under pjit the key batch
    is a global array, so this update is the all-gather the reference
    commented out (moco.py:55).
    """
    b = keys.shape[1]
    k = queue.shape[-1]
    cols = keys.transpose(0, 2, 1)  # [L, dim, B]
    queue = jax.lax.dynamic_update_slice(
        queue, cols.astype(queue.dtype), (0, 0, ptr))
    return queue, (ptr + b) % k


def contrastive_loss(logits: jax.Array) -> jax.Array:
    """Mean cross-entropy against the all-zero labels, averaged over bands
    (train.py:84: ``sum(CE(output[i], target[i])) / num_losses``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[..., 0])
