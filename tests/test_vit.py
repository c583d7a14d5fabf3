"""ViT encoder contract tests (reference encoder_ViT.py:119-203)."""

import jax
import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu import config
from frequency_wised_all_in_one_image_restoration_model_tpu.models.encoder_vit import ViTEncoder

P = 32


def make_vit(decompose="none", batch_wise=False, depth=2, heads=2):
    cfg = config.make_config(encoder_type="ViT", de_type=["2tasks"],
                             patch_size=P, frequency_decompose_type=decompose,
                             batch_wise_decompose=batch_wise)
    return cfg, ViTEncoder(cfg=cfg, image_size=P, depth=depth, heads=heads,
                           mlp_dim=64)


@pytest.mark.parametrize("decompose", ["none", "2_bands", "DC"])
def test_vit_contract(decompose):
    cfg, vit = make_vit(decompose)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, P, P, 3))
    variables = vit.init({"params": jax.random.PRNGKey(1),
                          "dropout": jax.random.PRNGKey(2)}, x, train=False)
    fea, out, inter = vit.apply(variables, x, train=False)
    assert fea.shape == (2, cfg.encoder_dim)
    assert out.shape == (1, 2, cfg.encoder_dim)
    assert inter.shape == (2, P, P, cfg.encoder_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_batch_wise_lamb_shape():
    cfg, vit = make_vit("2_bands", batch_wise=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (cfg.batch_size, P, P, 3))
    variables = vit.init({"params": jax.random.PRNGKey(1),
                          "dropout": jax.random.PRNGKey(2)}, x, train=False)
    lamb = variables["params"]["attn_0"]["lamb"]
    assert lamb.shape == (2, cfg.batch_size, 2)  # [bands, batch, heads]


def test_vit_train_mode_with_dropout():
    cfg, vit = make_vit()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, P, P, 3))
    variables = vit.init({"params": jax.random.PRNGKey(1),
                          "dropout": jax.random.PRNGKey(2)}, x, train=True)
    (fea, out, inter), upd = vit.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3)})
    assert "batch_stats" in upd
    assert np.isfinite(np.asarray(out)).all()


def test_vit_with_dgrn_decoder():
    """The ViT+DGRN composition (reference decoder_DGRN.py:122-124:
    n_feats = encoder_dim for ViT)."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import build_models
    cfg = config.make_config(encoder_type="ViT", decoder_type="ResNet",
                             de_type=["2tasks"], patch_size=P)
    bundle = build_models(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, P, P, 3))
    evars = bundle.encoder.init({"params": jax.random.PRNGKey(1),
                                 "dropout": jax.random.PRNGKey(2)},
                                x, train=False)
    _, _, inter = bundle.encoder.apply(evars, x, train=False)
    dvars = bundle.decoder.init({"params": jax.random.PRNGKey(3)}, x, inter,
                                train=False)
    out = bundle.decoder.apply(dvars, x, inter, train=False)
    assert out.shape == (2, P, P, 3)
