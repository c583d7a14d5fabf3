"""Misc image ops from the reference's utils surface.

* :func:`edge_map` — reference ``EdgeComputation`` (utils/image_utils.py:
  14-45): mean absolute finite-difference map, each pixel accumulating its
  left/right/up/down gradients, channel-averaged, divided by 4.
* :func:`slice_image2patches` / :func:`splice_patches2image` — the
  non-overlap-aware grid patchers (utils/image_utils.py:68-98).
* :func:`gan_loss` — reference ``GANLoss`` (utils/loss_utils.py:6-45):
  LSGAN (MSE against 1/0 targets) and vanilla (sigmoid BCE) modes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def edge_map(x: jax.Array) -> jax.Array:
    """``[B, H, W, C] -> [B, H, W, 1]`` mean absolute gradient / 4."""
    x = x.astype(jnp.float32)
    dx = jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :])
    dy = jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :])
    y = jnp.zeros_like(x)
    y = y.at[:, :, 1:, :].add(dx)
    y = y.at[:, :, :-1, :].add(dx)
    y = y.at[:, 1:, :, :].add(dy)
    y = y.at[:, :-1, :, :].add(dy)
    return jnp.mean(y, axis=-1, keepdims=True) / 4.0


def slice_image2patches(image: np.ndarray, patch_size: int = 64,
                        overlap: int = 0) -> np.ndarray:
    """HWC -> [N, p+ov, p+ov, C] non-strided grid with edge padding."""
    assert image.shape[0] % patch_size == 0 and image.shape[1] % patch_size == 0
    h, w = image.shape[:2]
    padded = np.pad(image, ((overlap, overlap), (overlap, overlap), (0, 0)),
                    mode="edge")
    patches = []
    for i in range(h // patch_size):
        for j in range(w // patch_size):
            patches.append(padded[i * patch_size:(i + 1) * patch_size + overlap,
                                  j * patch_size:(j + 1) * patch_size + overlap])
    return np.stack(patches)


def splice_patches2image(patches: np.ndarray, image_size: Tuple[int, int, int],
                         overlap: int = 0) -> np.ndarray:
    """Inverse of :func:`slice_image2patches` (overlap margins dropped)."""
    h, w = image_size[0], image_size[1]
    patch_size = patches.shape[-2] - overlap
    out = np.zeros(image_size, patches.dtype)
    idx = 0
    for i in range(h // patch_size):
        for j in range(w // patch_size):
            out[i * patch_size:(i + 1) * patch_size,
                j * patch_size:(j + 1) * patch_size] = \
                patches[idx, overlap:patch_size + overlap,
                        overlap:patch_size + overlap]
            idx += 1
    return out


def gan_loss(pred: jax.Array, target_is_real: bool,
             mode: str = "lsgan") -> jax.Array:
    """Discriminator/generator adversarial loss (loss_utils.py:6-45)."""
    target = jnp.full_like(pred, 1.0 if target_is_real else 0.0)
    if mode == "lsgan":
        return jnp.mean((pred - target) ** 2)
    if mode == "vanilla":
        # sigmoid BCE with logits
        return jnp.mean(jnp.maximum(pred, 0) - pred * target
                        + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    raise ValueError(f"unknown gan loss mode {mode!r}")
