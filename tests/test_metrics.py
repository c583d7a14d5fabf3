"""Metric tests: PSNR closed-form, SSIM properties + skimage-algorithm parity."""

import jax.numpy as jnp
import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu.ops import metrics


def test_psnr_closed_form(rng):
    x = rng.uniform(0.2, 0.8, (2, 32, 32, 3)).astype(np.float32)
    noise = np.full_like(x, 0.1)
    got = np.asarray(metrics.psnr(jnp.asarray(x + 0.0), jnp.asarray(x + noise)))
    # mse = 0.01 -> psnr = 20
    np.testing.assert_allclose(got, [20.0, 20.0], atol=1e-3)


def test_ssim_identity_is_one(rng):
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    s = float(metrics.ssim(jnp.asarray(x), jnp.asarray(x))[0])
    assert abs(s - 1.0) < 1e-5


def test_ssim_decreases_with_noise(rng):
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    y1 = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    y2 = np.clip(x + rng.normal(0, 0.3, x.shape), 0, 1).astype(np.float32)
    s1 = float(metrics.ssim(jnp.asarray(x), jnp.asarray(y1))[0])
    s2 = float(metrics.ssim(jnp.asarray(x), jnp.asarray(y2))[0])
    assert 0 < s2 < s1 < 1


def _skimage_ssim_np(x, y, win=7, data_range=1.0):
    """Literal numpy re-execution of skimage.structural_similarity defaults
    (uniform filter, sample covariance, crop (win-1)//2 borders) for one
    single-channel image."""
    from numpy.lib.stride_tricks import sliding_window_view

    def ufilt(a):
        v = sliding_window_view(a, (win, win))
        return v.mean(axis=(-2, -1))

    npix = win * win
    cov_norm = npix / (npix - 1)
    ux, uy = ufilt(x), ufilt(y)
    uxx, uyy, uxy = ufilt(x * x), ufilt(y * y), ufilt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return s.mean()


def test_ssim_matches_skimage_algorithm(rng):
    x = rng.uniform(0, 1, (24, 24)).astype(np.float64)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float64)
    expected = _skimage_ssim_np(x, y)
    got = float(metrics.ssim(jnp.asarray(x[None, :, :, None]), jnp.asarray(y[None, :, :, None]))[0])
    assert abs(got - expected) < 1e-4


def test_ssim_gaussian_identity(rng):
    x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    s = float(metrics.ssim_gaussian(jnp.asarray(x), jnp.asarray(x)))
    assert abs(s - 1.0) < 1e-4


def test_average_meter():
    m = metrics.AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 1)
    assert abs(m.avg - 2.0) < 1e-9
    assert m.count == 3
