"""On-device image quality metrics (PSNR / SSIM / NIQE-stub) + AverageMeter.

The reference computes PSNR/SSIM by shipping every restored image to the CPU
and calling skimage (utils/val_utils.py:50-66) — a host round-trip per tile
batch. Here both metrics are pure JAX and run on-device inside the jitted
eval path; the numerics replicate skimage's defaults so scores are directly
comparable:

* PSNR: ``10*log10(data_range^2 / mse)`` over the whole image
  (skimage.metrics.peak_signal_noise_ratio with data_range=1).
* SSIM: skimage.metrics.structural_similarity defaults — uniform 7x7 window,
  K1=0.01, K2=0.03, sample covariance (N/(N-1)), per-channel then averaged
  (``channel_axis=2``), scores averaged over the valid interior (skimage
  crops ``(win-1)//2`` borders, which makes boundary padding irrelevant —
  we compute VALID-mode windows directly).

Also provided: a Gaussian-window differentiable SSIM matching the reference's
``utils/pytorch_ssim/__init__.py:19-78`` (11x11 gaussian sigma 1.5, SAME
zero padding, mean over the full map) for loss use, and the reference's
``AverageMeter`` (val_utils.py:8-26).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Per-image PSNR. ``pred/target: [B, H, W, C]`` -> ``[B]``.

    Inputs are clipped to [0, data_range] first, exactly as the reference does
    before calling skimage (val_utils.py:52-53).
    """
    pred = jnp.clip(pred.astype(jnp.float32), 0.0, data_range)
    target = jnp.clip(target.astype(jnp.float32), 0.0, data_range)
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10((data_range * data_range) / jnp.maximum(mse, 1e-12))


def _uniform_filter_valid(x: jax.Array, win: int) -> jax.Array:
    """VALID-mode uniform ``win x win`` mean filter, per channel.

    ``x: [B, H, W, C] -> [B, H-win+1, W-win+1, C]``. Implemented as two
    separable 1-D depthwise convolutions (cheap on the VPU/MXU).
    """
    c = x.shape[-1]
    kh = jnp.full((win, 1, 1, c), 1.0 / win, dtype=x.dtype)  # HWIO, depthwise
    kw = jnp.full((1, win, 1, c), 1.0 / win, dtype=x.dtype)
    # Metrics must be exact: force fp32 math (default precision truncates
    # conv operands, which is fine for model compute but not for PSNR/SSIM).
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return x


def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Per-image SSIM matching skimage defaults. ``[B,H,W,C] -> [B]``."""
    x = jnp.clip(pred.astype(jnp.float32), 0.0, data_range)
    y = jnp.clip(target.astype(jnp.float32), 0.0, data_range)

    npix = win_size * win_size
    cov_norm = npix / (npix - 1.0)  # sample covariance (skimage default)

    ux = _uniform_filter_valid(x, win_size)
    uy = _uniform_filter_valid(y, win_size)
    uxx = _uniform_filter_valid(x * x, win_size)
    uyy = _uniform_filter_valid(y * y, win_size)
    uxy = _uniform_filter_valid(x * y, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux * ux + uy * uy + c1) * (vx + vy + c2))
    return jnp.mean(s, axis=(1, 2, 3))


def compute_psnr_ssim(pred: jax.Array, target: jax.Array) -> tuple:
    """Batch-mean PSNR, SSIM, N — the reference's return contract
    (val_utils.py:50-66) with ``[B, H, W, C]`` device arrays.
    """
    p = psnr(pred, target)
    s = ssim(pred, target)
    return jnp.mean(p), jnp.mean(s), pred.shape[0]


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(win: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(win) - win // 2) ** 2) / (2.0 * sigma * sigma))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim_gaussian(
    pred: jax.Array,
    target: jax.Array,
    win_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Differentiable Gaussian-window SSIM (scalar mean over batch+map).

    Port of the reference's torch SSIM loss (utils/pytorch_ssim/__init__.py:
    19-43): 11x11 gaussian(sigma=1.5), SAME zero padding, C1=0.01^2,
    C2=0.03^2, mean over the entire (un-cropped) map.
    """
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    c = x.shape[-1]
    k2d = jnp.asarray(_gaussian_kernel(win_size, sigma))
    kern = jnp.broadcast_to(k2d[:, :, None, None], (win_size, win_size, 1, c))

    def filt(z):
        return jax.lax.conv_general_dilated(
            z, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)

    mu1, mu2 = filt(x), filt(y)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(x * x) - mu1_sq
    s2 = filt(y * y) - mu2_sq
    s12 = filt(x * y) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(smap)


class AverageMeter:
    """Weighted running average — byte-compatible semantics with
    reference val_utils.py:8-26."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
