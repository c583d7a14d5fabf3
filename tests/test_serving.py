"""AOT serving export: artifact round-trip and numerical equivalence."""

import dataclasses

import jax
import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu import config, serving
from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import (
    build_models, eval_forward)


def _tiny_cfg():
    return config.make_config(
        synthetic_data=True, de_type=["deraining"],
        test_de_type=["deraining"], encoder_type="ResNet",
        decoder_type="ResNet", encoder_dim=16, dgrn_groups=1,
        dgrn_blocks=1, patch_size=32, crop_test_imgs_size=32,
        dtype="float32")


def _init_vars(cfg, bundle, x):
    rng = jax.random.PRNGKey(0)
    enc_vars = jax.jit(lambda r, x: bundle.encoder.init(
        {"params": r, "droppath": r}, x, train=False))(rng, x)
    _, _, inter = jax.jit(lambda v, x: bundle.encoder.apply(
        v, x, train=False))(enc_vars, x)
    dec_vars = jax.jit(lambda r, x, i: bundle.decoder.init(
        {"params": r, "droppath": r}, x, i, train=False))(
            jax.random.PRNGKey(1), x, inter)
    return enc_vars, dec_vars


def test_export_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    bundle = build_models(cfg, eval_mode=True)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    enc_vars, dec_vars = _init_vars(cfg, bundle, x[:1])

    blob = serving.export_eval(cfg, (enc_vars, dec_vars), batch=4)
    path = str(tmp_path / "model.fairm")
    serving.save(path, blob)
    model = serving.load(path)

    assert model.input_shape == (4, 32, 32, 3)
    got = np.asarray(model(x))
    want = np.asarray(jax.jit(lambda e, d, x: eval_forward(
        bundle, e, d, x))(enc_vars, dec_vars, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # partial batch: pads to the exported batch and crops the output
    got2 = np.asarray(model(x[:2]))
    np.testing.assert_allclose(got2, want[:2], rtol=1e-5, atol=1e-5)

    # shape validation
    with pytest.raises(ValueError):
        model(np.zeros((1, 16, 16, 3), np.float32))
    with pytest.raises(ValueError):
        model(np.zeros((5, 32, 32, 3), np.float32))


def test_artifact_is_self_contained(tmp_path):
    """The artifact deserializes and runs without model/config code."""
    cfg = _tiny_cfg()
    bundle = build_models(cfg, eval_mode=True)
    x = np.zeros((2, 32, 32, 3), np.float32)
    enc_vars, dec_vars = _init_vars(cfg, bundle, x[:1])
    blob = serving.export_eval(cfg, (enc_vars, dec_vars), batch=2)

    # loads() only touches numpy/json/jax.export — no model imports
    model = serving.loads(blob)
    out = model(x)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert model.meta["encoder_type"] == "ResNet"
