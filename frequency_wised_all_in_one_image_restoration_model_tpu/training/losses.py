"""Training losses: L1, frequency-band L1, contrastive CE.

Reference train.py:63-92: ``loss = l1 + frequency_l1_loss_weight *
l1(decompose(restored), decompose(clean)) + contrast_loss_weight * CE_mean``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import frequency


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean absolute error (torch nn.L1Loss default reduction)."""
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def frequency_l1_loss(pred: jax.Array, target: jax.Array, num_bands: int) -> jax.Array:
    """L1 between per-band masked spectra of pred and target.

    The reference decomposes with ``inverse=False`` — stacked (real, imag)
    spectra, not spatial reconstructions (train.py:69-70, 91;
    frequency_decompose.py:60-62). Inputs are NHWC; the FFT runs over H, W.
    """
    p = pred.transpose(0, 3, 1, 2)  # [B, C, H, W] so H,W trail
    t = target.transpose(0, 3, 1, 2)
    sp = frequency.frequency_decompose(p, num_bands, inverse=False)
    st = frequency.frequency_decompose(t, num_bands, inverse=False)
    return jnp.mean(jnp.abs(sp - st))


def restoration_loss(cfg, restored, clean, contrast_loss):
    """Joint-phase objective (train.py:87-92). Returns (loss, l1_term)."""
    l1 = l1_loss(restored, clean)
    if cfg.num_frequency_bands_l1 != -1:
        l1 = l1 + cfg.frequency_l1_loss_weight * frequency_l1_loss(
            restored, clean, cfg.num_frequency_bands_l1)
    total = l1 + cfg.contrast_loss_weight * contrast_loss
    return total, l1
