"""Tiled full-image inference with overlap-average stitching.

Reference protocol (test.py:36-71): tile H,W with stride = patch size plus a
final edge-aligned tile, run the whole tile grid as one mega-batch through
the eval forward, accumulate into sum/weight canvases and divide.

TPU-first changes:
* the reference stitches with a Python loop of in-place slice adds on device
  (test.py:65-69); here the stitch is one ``scatter-add`` over a padded tile
  batch inside jit;
* the tile batch is padded to a small set of bucket sizes so arbitrary image
  sizes hit a handful of compiled programs instead of one per tile count;
* FIX (documented, BASELINE.md note): the reference adds the *input* tiles
  into the canvas (test.py:67 uses ``patched_input_img``) and discards the
  network output — it measures PSNR of the degraded input. We stitch the
  restored tiles, which is the unmistakable intent of test.py:59.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tile_offsets(size: int, patch: int) -> List[int]:
    """Stride-``patch`` offsets plus a final edge-aligned one
    (reference test.py:48-49)."""
    if size < patch:
        raise ValueError(f"image side {size} smaller than patch {patch}")
    return list(range(0, size - patch, patch)) + [size - patch]


def bucket_size(n: int, bucket: int = 8) -> int:
    """Round the tile count up to a multiple of ``bucket`` (compile reuse)."""
    return ((n + bucket - 1) // bucket) * bucket


def extract_tiles(img: np.ndarray, patch: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """``img [H, W, 3] -> (tiles [Npad, p, p, 3], offsets [Npad, 2], n_real)``.

    Host-side (numpy); padding repeats tile 0 so the padded forward is
    harmless (padded tiles get zero stitch weight).
    """
    h, w = img.shape[:2]
    offs = [(hy, wx) for hy in tile_offsets(h, patch)
            for wx in tile_offsets(w, patch)]
    n = len(offs)
    npad = bucket_size(n)
    tiles = np.zeros((npad, patch, patch, img.shape[2]), img.dtype)
    offsets = np.zeros((npad, 2), np.int32)
    for i, (hy, wx) in enumerate(offs):
        tiles[i] = img[hy:hy + patch, wx:wx + patch]
        offsets[i] = (hy, wx)
    for i in range(n, npad):
        tiles[i] = tiles[0]
    return tiles, offsets, n


@functools.partial(jax.jit, static_argnums=(3, 4))
def stitch_tiles(tiles: jax.Array, offsets: jax.Array, n_real: jax.Array,
                 out_h: int, out_w: int) -> jax.Array:
    """Overlap-averaged stitch: scatter-add tiles and per-pixel counts.

    ``tiles [Npad, p, p, C]``, ``offsets [Npad, 2]``, ``n_real`` scalar
    (tiles with index >= n_real contribute zero weight).
    Returns ``[out_h, out_w, C]``.
    """
    npad, p, _, c = tiles.shape
    valid = (jnp.arange(npad) < n_real).astype(tiles.dtype)

    acc = jnp.zeros((out_h, out_w, c), tiles.dtype)
    weight = jnp.zeros((out_h, out_w, 1), tiles.dtype)

    def body(i, carry):
        acc, weight = carry
        hy, wx = offsets[i, 0], offsets[i, 1]
        v = valid[i]
        tile = tiles[i] * v
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (hy, wx, 0), (p, p, c)) + tile,
            (hy, wx, 0))
        wpatch = jnp.full((p, p, 1), v, tiles.dtype)
        weight = jax.lax.dynamic_update_slice(
            weight,
            jax.lax.dynamic_slice(weight, (hy, wx, 0), (p, p, 1)) + wpatch,
            (hy, wx, 0))
        return acc, weight

    acc, weight = jax.lax.fori_loop(0, npad, body, (acc, weight))
    return acc / jnp.maximum(weight, 1e-8)
