"""Integration tests for the two-phase train step (ResNet + DGRN slice).

Mirrors the reference's only regression signal — losses over epochs in
train.log (train.py:98-117) — as actual assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu import config
from frequency_wised_all_in_one_image_restoration_model_tpu.data.synthetic import SyntheticTrainLoader
from frequency_wised_all_in_one_image_restoration_model_tpu.models import moco
from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import ModelBundle
from frequency_wised_all_in_one_image_restoration_model_tpu.models.decoder_dgrn import DGRN
from frequency_wised_all_in_one_image_restoration_model_tpu.models.encoder_resnet import ResNetEncoder
from frequency_wised_all_in_one_image_restoration_model_tpu.training import state as state_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.training import steps as steps_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.training.steps import array_batch


def tiny_setup(seed=0, num_frequency_bands_l1=-1, batch_tile=1):
    cfg = config.make_config(
        encoder_type="ResNet", decoder_type="ResNet",
        de_type=["2tasks"], patch_size=32, encoder_dim=32,
        lr=1e-3, seed=seed, num_frequency_bands_l1=num_frequency_bands_l1,
        synthetic_data=True)
    bundle = ModelBundle(
        cfg=cfg,
        encoder=ResNetEncoder(dim=cfg.encoder_dim),
        decoder=DGRN(n_feats=cfg.encoder_dim // 4, n_groups=1, n_blocks=1),
        num_losses=1)
    loader = SyntheticTrainLoader(cfg, seed=seed)
    batch = loader.next_batch()
    if batch_tile > 1:
        from frequency_wised_all_in_one_image_restoration_model_tpu.parallel import mesh as mesh_lib
        batch = mesh_lib.tile_batch(batch, batch_tile)
    st = state_lib.create_train_state(cfg, bundle, jax.random.PRNGKey(seed), batch)
    return cfg, bundle, loader, st


def test_encoder_phase_step_runs_and_mutates_state():
    cfg, bundle, loader, st = tiny_setup()
    enc_step, _ = steps_lib.jit_train_steps(cfg, bundle)
    # copy before the call: the step donates the state's buffers
    enc0 = jax.tree_util.tree_map(np.array, st.params["encoder"])
    dec0 = jax.tree_util.tree_map(np.array, st.params["decoder"])
    k0 = jax.tree_util.tree_map(np.array, st.moco.params_k)
    st1, m = enc_step(st, array_batch(loader.next_batch()))
    assert np.isfinite(float(m["loss"]))
    assert int(st1.step) == 1
    # queue pointer advanced by batch size, modulo K = 3*batch
    assert int(st1.moco.queue_ptr) == cfg.batch_size
    # encoder params updated; decoder untouched in phase A (zero grads)
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, np.asarray(b)), enc0, st1.params["encoder"])
    assert any(jax.tree_util.tree_leaves(changed))
    dec_same = jax.tree_util.tree_map(
        lambda a, b: np.allclose(a, np.asarray(b)), dec0, st1.params["decoder"])
    assert all(jax.tree_util.tree_leaves(dec_same))
    # EMA with m=0.999 of identical init keeps key params (almost) in place
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - np.asarray(b)))),
        k0, st1.moco.params_k)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-3


def test_queue_wraps():
    cfg, bundle, loader, st = tiny_setup()
    enc_step, _ = steps_lib.jit_train_steps(cfg, bundle)
    for _ in range(3):  # K = 6, B = 2 -> wraps to 0 after 3 steps
        st, _ = enc_step(st, array_batch(loader.next_batch()))
    assert int(st.moco.queue_ptr) == 0


def test_joint_phase_l1_decreases():
    cfg, bundle, loader, st = tiny_setup()
    _, joint_step = steps_lib.jit_train_steps(cfg, bundle)
    l1s = []
    for _ in range(12):
        st, m = joint_step(st, array_batch(loader.next_batch()))
        l1s.append(float(m["l1_loss"]))
    assert all(np.isfinite(l1s))
    assert np.mean(l1s[-3:]) < np.mean(l1s[:3]), l1s


def test_joint_phase_with_frequency_l1():
    cfg, bundle, loader, st = tiny_setup(num_frequency_bands_l1=4)
    _, joint_step = steps_lib.jit_train_steps(cfg, bundle)
    st, m = joint_step(st, array_batch(loader.next_batch()))
    assert np.isfinite(float(m["loss"]))
    # total includes the weighted contrastive term (train.py:92)
    assert float(m["loss"]) >= float(m["l1_loss"]) - 1e-6


def test_determinism():
    mets = []
    for _ in range(2):
        cfg, bundle, loader, st = tiny_setup(seed=7)
        enc_step, _ = steps_lib.jit_train_steps(cfg, bundle)
        st, m = enc_step(st, array_batch(loader.next_batch()))
        mets.append(float(m["loss"]))
    assert mets[0] == mets[1]


def test_lr_schedule_matches_reference_staircase():
    cfg = config.make_config(epochs_encoder=100, lr=1e-3)
    lr = lambda e: state_lib.lr_for_epoch(cfg, e)
    assert lr(0) == 1e-3
    assert lr(1) == 1e-3            # end of epoch 0: 1e-3 * 0.1^(0//60)
    assert lr(61) == pytest.approx(1e-4)   # epoch 60 finished: 0.1^(60//60)
    # epoch 100 (== epochs_encoder) still phase-A rule: 0.1^(100//60) = 0.1^1
    assert lr(101) == pytest.approx(1e-4)
    assert lr(102) == pytest.approx(1e-4)  # epoch 101: phase-B base
    assert lr(102 + 125) == pytest.approx(5e-5)  # (226-100)//125 == 1


def test_contrastive_loss_separates_positive():
    # logits with a strong positive should have lower CE than random
    q = moco.normalize_bands(jnp.ones((1, 2, 8)))
    k = q
    queue = moco.init_queue(jax.random.PRNGKey(0), 1, 8, 6)
    logits = moco.contrastive_logits(q, k, queue)
    good = float(moco.contrastive_loss(logits))
    bad = float(moco.contrastive_loss(jnp.zeros_like(logits)))
    assert good < bad
