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


def test_bilinear_gather_matches_four_corner_reference(rng):
    """The fused single-gather bilinear sampler (1-px pad + 4-corner
    channel concat) must equal the masked 4-corner formulation everywhere,
    including exact boundary coordinates and far out-of-bounds."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.ops.deform_conv import (
        _bilinear_gather)

    B, H, W, C = 2, 6, 5, 3
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    yy = rng.uniform(-3, H + 2, (B, 500)).astype(np.float32)
    xx = rng.uniform(-3, W + 2, (B, 500)).astype(np.float32)
    yy[0, :4] = [-1.0, 0.0, H - 1.0, float(H)]
    xx[0, :4] = [-1.0, 0.0, W - 1.0, float(W)]

    out = np.asarray(_bilinear_gather(jnp.asarray(x), jnp.asarray(yy),
                                      jnp.asarray(xx)))
    ref = np.zeros((B, 500, C), np.float32)
    y0 = np.floor(yy)
    x0 = np.floor(xx)
    wy, wx = yy - y0, xx - x0
    for dy in (0, 1):
        for dx in (0, 1):
            cy, cx = y0 + dy, x0 + dx
            valid = (cy >= 0) & (cy <= H - 1) & (cx >= 0) & (cx <= W - 1)
            cyc = np.clip(cy, 0, H - 1).astype(int)
            cxc = np.clip(cx, 0, W - 1).astype(int)
            vals = x[np.arange(B)[:, None], cyc, cxc]
            ref += vals * (np.abs(1 - dy - wy) * np.abs(1 - dx - wx)
                           * valid)[..., None]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert np.isfinite(out).all()
