"""FFT frequency-band decomposition ops.

Behavioral equivalent of the reference ``net/utils/frequency_decompose.py``
(FrequencyDecompose, lines 5-126), rebuilt TPU-first:

* Ring masks are **static numpy constants** baked in at trace time, not
  device-bound buffers created with ``.cuda()`` in a constructor
  (reference frequency_decompose.py:17-26 binds masks to the current CUDA
  device, a known portability bug).
* The per-band Python loop over FFT multiplies + inverse FFTs
  (reference :36-66) becomes **one batched complex multiply and one batched
  inverse FFT** over a leading band axis — XLA tiles the whole thing.
* FFT always runs in float32/complex64 (PSNR parity; bf16 FFT is lossy).

Mask semantics (kept bit-compatible with the reference):

* ``frequency_decompose`` (:28-68): ``num_bands`` rings with boundaries
  ``[0, s), [s, 2s), ..., [1-s, 1]`` — strict ``<`` except the final band
  which uses ``<=``.
* ``frequency_decompose_1`` (:70-107): DC point plus rings
  ``(0, s], (s, 2s], ..., (1-s, 1]`` — ``num_bands + 1`` outputs, all ``<=``
  boundaries differenced (for a band width of ``size``, pass
  ``num_bands = round(1/size)`` and you get ``num_bands+1`` outputs; callers
  in the reference pass ``size = 1/(L-1)`` to get L outputs,
  encoder_Uformer.py:935).
* ``frequency_decompose_dc`` (:109-118): spatial mean / residual split
  (no FFT).
"""

from __future__ import annotations

import functools
import math
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def ring_masks(h: int, w: int, num_bands: int, variant: str = "open") -> np.ndarray:
    """Concentric-ring boolean masks over an fftshifted spectrum.

    Returns float32 ``[B, h, w]`` where ``B = num_bands`` for ``variant='open'``
    and ``num_bands + 1`` for ``variant='dc'``. The masks partition the plane
    restricted to ``dist <= max_radius`` (the spectrum corners beyond
    ``max_radius`` fall in no band, exactly like the reference).

    Reference: frequency_decompose.py:17-26 (geometry), :38-48 and :80-87
    (band boundaries).
    """
    # float32 throughout: the reference computes dist/radius in torch fp32
    # (frequency_decompose.py:17-26), and pixels sitting exactly on a band
    # boundary flip bands under fp64 (1-ulp differences at exact radii)
    ys = np.arange(h, dtype=np.int64)[:, None]
    xs = np.arange(w, dtype=np.int64)[None, :]
    cx, cy = int(w / 2), int(h / 2)
    dist = np.sqrt(((xs - cx) ** 2 + (ys - cy) ** 2).astype(np.float32))
    max_radius = np.sqrt(np.float32(cx * cx + cy * cy))

    masks = []
    last = np.zeros((h, w), dtype=bool)
    if variant == "open":
        edges = np.linspace(1.0 / num_bands, 1.0, num_bands).astype(np.float32)
        for i, sz in enumerate(edges):
            radius = np.float32(max_radius * sz)
            if i == num_bands - 1:
                cur = dist <= radius
            else:
                cur = dist < radius
            masks.append(cur ^ last)
            last = cur
    elif variant == "dc":
        edges = np.linspace(0.0, 1.0, num_bands + 1).astype(np.float32)
        for sz in edges:
            cur = dist <= np.float32(max_radius * sz)
            masks.append(cur ^ last)
            last = cur
    else:
        raise ValueError(f"unknown ring-mask variant: {variant!r}")
    return np.stack(masks).astype(np.float32)


def _spectrum(x: jax.Array) -> jax.Array:
    """fftshift(fft2(x)) over the trailing two axes, in complex64."""
    return jnp.fft.fftshift(jnp.fft.fft2(x.astype(jnp.float32)), axes=(-2, -1))


def _finish(banded: jax.Array, inverse: Union[bool, str]) -> jax.Array:
    if inverse == "visual":
        return jnp.abs(banded)  # magnitude spectrum; reference :55-56
    banded = jnp.fft.ifftshift(banded, axes=(-2, -1))
    if inverse is True:
        return jnp.fft.ifft2(banded).real  # reference :57-59
    if inverse is False:
        # The reference stacks the (ifftshift-ed) masked SPECTRUM — no inverse
        # FFT (reference :60-62). This is what the frequency-L1 loss consumes
        # (train.py:69-70, :91).
        return jnp.stack((banded.real, banded.imag), axis=-1)
    raise ValueError(f"invalid inverse mode: {inverse!r}")


def frequency_decompose(
    x: jax.Array,
    num_bands: int,
    inverse: Union[bool, str] = True,
) -> jax.Array:
    """Equal-width ring decomposition ``[0,s) ... [1-s,1]``.

    Args:
      x: real array ``[..., H, W]``.
      num_bands: number of rings.
      inverse: True -> per-band spatial reconstructions (real); False ->
        fftshift-removed complex spectra stacked as (real, imag) in a trailing
        axis; 'visual' -> shifted magnitude spectra.

    Returns ``[num_bands, ..., H, W]`` (plus trailing 2 for inverse=False).
    Summing the bands of an ``inverse=True`` decomposition reconstructs ``x``
    up to the out-of-disk spectrum corners.

    Reference: frequency_decompose.py:28-68.
    """
    h, w = x.shape[-2], x.shape[-1]
    masks = jnp.asarray(ring_masks(h, w, num_bands, "open"))
    fx = _spectrum(x)
    bshape = (num_bands,) + (1,) * (x.ndim - 2) + (h, w)
    banded = masks.reshape(bshape) * fx[None]
    return _finish(banded, inverse)


def frequency_decompose_1(
    x: jax.Array,
    num_rings: int,
    inverse: Union[bool, str] = True,
) -> jax.Array:
    """DC-point + closed-ring decomposition ``0, (0,s], ..., (1-s,1]``.

    ``num_rings`` rings around the DC point, giving ``num_rings + 1`` bands.
    The reference instantiates this with ``size = 1/(L-1)`` to split an input
    into L bands (encoder_Uformer.py:934-935); call with
    ``num_rings = L - 1`` here.

    Reference: frequency_decompose.py:70-107.
    """
    h, w = x.shape[-2], x.shape[-1]
    masks = jnp.asarray(ring_masks(h, w, num_rings, "dc"))
    fx = _spectrum(x)
    bshape = (num_rings + 1,) + (1,) * (x.ndim - 2) + (h, w)
    banded = masks.reshape(bshape) * fx[None]
    return _finish(banded, inverse)


def frequency_decompose_dc(x: jax.Array) -> jax.Array:
    """Mean / residual split over the trailing two axes (no FFT).

    Returns ``[2, ..., H, W]`` with band 0 the broadcast spatial mean and
    band 1 the residual. Reference: frequency_decompose.py:109-118.
    """
    dc = jnp.mean(x, axis=(-2, -1), keepdims=True)
    dc = jnp.broadcast_to(dc, x.shape)
    return jnp.stack((dc, x - dc), axis=0)


def decompose(
    x: jax.Array,
    kind: str,
    num_bands: int,
    inverse: Union[bool, str] = True,
) -> jax.Array:
    """Dispatch matching the reference module's ``type`` argument.

    ``kind='frequency_decompose'`` -> ``num_bands`` open rings;
    ``kind='frequency_decompose_1'`` -> pass the reference's ``num_bands``
    semantics (``floor(1/size)`` rings, producing ``num_bands+1`` outputs);
    ``kind='frequency_decompose_dc'`` -> 2 bands, ``num_bands`` ignored.

    Reference: frequency_decompose.py:120-126.
    """
    if kind == "frequency_decompose":
        return frequency_decompose(x, num_bands, inverse)
    if kind == "frequency_decompose_1":
        return frequency_decompose_1(x, num_bands, inverse)
    if kind == "frequency_decompose_dc":
        return frequency_decompose_dc(x)
    raise ValueError(f"unknown decompose kind: {kind!r}")
