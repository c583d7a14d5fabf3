"""imresize / edge map / patch slicing / GAN loss tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu.ops import image as image_ops
from frequency_wised_all_in_one_image_restoration_model_tpu.ops.resize import imresize


def test_imresize_identity(rng):
    img = rng.uniform(0, 1, (16, 16, 3))
    out = imresize(img, scale=1.0)
    np.testing.assert_allclose(out, img, atol=1e-10)


def test_imresize_constant_preserved(rng):
    img = np.full((16, 24, 3), 0.5)
    for kernel in ("cubic", "box", "linear", "lanczos2", "lanczos3"):
        up = imresize(img, scale=1.7, kernel=kernel)
        np.testing.assert_allclose(up, 0.5, atol=1e-9, err_msg=kernel)
        down = imresize(img, scale=0.4, kernel=kernel)
        np.testing.assert_allclose(down, 0.5, atol=1e-9, err_msg=kernel)


def test_imresize_shapes_and_dtype(rng):
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    up = imresize(img, scale=2.0)
    assert up.shape == (40, 60, 3) and up.dtype == np.uint8
    down = imresize(img, output_shape=(10, 15))
    assert down.shape == (10, 15, 3)
    gray = imresize(img[:, :, 0], scale=0.5)
    assert gray.shape == (10, 15)


def test_imresize_antialiasing_widens_kernel():
    # MATLAB semantics: downsampling with antialiasing stretches the kernel
    # support by 1/scale (4 cubic taps -> ~16 at scale 0.25)
    from frequency_wised_all_in_one_image_restoration_model_tpu.ops.resize import (
        _contributions, _cubic)
    idx_aa, w_aa = _contributions(64, 16, 0.25, _cubic, 4.0, True)
    idx_no, w_no = _contributions(64, 16, 0.25, _cubic, 4.0, False)
    assert w_aa.shape[1] > 3 * w_no.shape[1]
    np.testing.assert_allclose(w_aa.sum(1), 1.0, atol=1e-12)
    np.testing.assert_allclose(w_no.sum(1), 1.0, atol=1e-12)


def test_edge_map(rng):
    x = jnp.zeros((1, 8, 8, 3)).at[:, :, 4:, :].set(1.0)
    e = np.asarray(image_ops.edge_map(x))
    assert e.shape == (1, 8, 8, 1)
    assert e[0, 0, 3, 0] > 0 and e[0, 0, 4, 0] > 0  # edge columns
    assert e[0, 0, 0, 0] == 0  # flat region


def test_slice_splice_roundtrip(rng):
    img = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
    patches = image_ops.slice_image2patches(img, 16, overlap=2)
    assert patches.shape == (6, 18, 18, 3)
    back = image_ops.splice_patches2image(patches, img.shape, overlap=2)
    np.testing.assert_allclose(back, img, atol=1e-7)


def test_gan_loss():
    logits = jnp.asarray([[0.0, 2.0], [-2.0, 1.0]])
    real_ls = float(image_ops.gan_loss(logits, True, "lsgan"))
    fake_ls = float(image_ops.gan_loss(logits, False, "lsgan"))
    assert real_ls != fake_ls
    v = float(image_ops.gan_loss(logits, True, "vanilla"))
    # BCE with logits against ones: mean(log(1+e^-x))
    expected = float(np.mean(np.log1p(np.exp(-np.asarray(logits)))))
    assert abs(v - expected) < 1e-6
    with pytest.raises(ValueError):
        image_ops.gan_loss(logits, True, "wgan")
