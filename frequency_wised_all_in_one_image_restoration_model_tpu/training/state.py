"""Train state: one donated pytree holding everything a step mutates.

The reference mutates four kinds of state imperatively — module params via
Adam (train.py:63), MoCo's key encoder + queue in place under ``no_grad``
(moco.py:44-66), BatchNorm running stats implicitly, and the LR via
``param_group['lr']`` pokes (train.py:142-149). All of that is explicit here
and flows through the jitted step functionally.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from ..config import Config
from ..models import airnet, moco
from ..models.airnet import ModelBundle


class TrainState(struct.PyTreeNode):
    step: jax.Array                      # int32 global step
    params: Any                          # {'encoder': ..., 'decoder': ...}
    extra: Any                           # mutable collections (batch_stats) per net
    moco: moco.MoCoState
    opt_state: optax.OptState
    rng: jax.Array


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam over the full param tree (reference train.py:63). The LR is an
    injected hyperparam so the host can apply the reference's staircase
    schedules (train.py:142-149) by assignment, exactly as the reference
    pokes ``param_group['lr']``."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)


def lr_for_epoch(cfg: Config, epoch: int) -> float:
    """Staircase LR as a function of the epoch being *trained*.

    The reference constructs Adam with ``opt.lr`` and re-assigns the LR at
    the END of each epoch from the just-finished epoch index
    (train.py:142-149), so epoch ``e`` trains with the value derived from
    ``e - 1``:
      phase A (e-1 <= epochs_encoder): lr * 0.1^((e-1)//60)
      phase B: 1e-4 * 0.5^((e-1-epochs_encoder)//125)
    """
    if epoch == 0:
        return cfg.lr
    prev = epoch - 1
    if prev <= cfg.epochs_encoder:
        return cfg.lr * (0.1 ** (prev // 60))
    return 1e-4 * (0.5 ** ((prev - cfg.epochs_encoder) // 125))


def with_learning_rate(state: TrainState, lr: float) -> TrainState:
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def create_train_state(cfg: Config, bundle: ModelBundle, rng: jax.Array,
                       sample_batch: Any) -> TrainState:
    """Initialize params, MoCo state (key encoder = copy of query encoder,
    queue = normalized randn; moco.py:33-40), and optimizer state."""
    r_enc, r_dec, r_queue, r_state = jax.random.split(rng, 4)
    x = jnp.asarray(sample_batch["d1"])

    # init under jit: eager init dispatches every op individually, which is
    # pathological over a remote-device link (and slow everywhere)
    enc_init = jax.jit(lambda r, x: bundle.encoder.init(
        {"params": r, "droppath": r, "dropout": r}, x, train=True))
    enc_vars = enc_init(r_enc, x)
    enc_params = enc_vars["params"]
    enc_extra = {k: v for k, v in enc_vars.items() if k != "params"}

    _, _, inter = jax.jit(
        lambda v, x: bundle.encoder.apply(v, x, train=False))(enc_vars, x)
    dec_init = jax.jit(lambda r, x, inter: bundle.decoder.init(
        {"params": r, "droppath": r, "dropout": r}, x, inter, train=True))
    dec_vars = dec_init(r_dec, x, inter)
    dec_params = dec_vars["params"]
    dec_extra = {k: v for k, v in dec_vars.items() if k != "params"}

    # plain dicts throughout (flax >= 0.7 returns plain dicts from init);
    # mixing FrozenDict and dict breaks tree_map structure equality
    params = {"encoder": core.unfreeze(enc_params),
              "decoder": core.unfreeze(dec_params)}
    extra = {"encoder": core.unfreeze(enc_extra),
             "decoder": core.unfreeze(dec_extra)}

    # K = 3 * batch (reference model.py:35), derived from the GLOBAL batch so
    # the ring stays aligned under data parallelism (the enqueue requires
    # K % B == 0, moco.py:59)
    k_queue = int(x.shape[0]) * 3
    moco_state = moco.init_state(
        r_queue, enc_params, enc_extra, bundle.num_losses,
        cfg.encoder_dim, k_queue)

    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        extra=extra,
        moco=moco_state,
        opt_state=opt_state,
        rng=r_state,
    )
