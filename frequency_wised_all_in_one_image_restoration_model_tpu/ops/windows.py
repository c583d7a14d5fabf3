"""Window partition/reverse and static attention-mask/bias-index builders.

Equivalent of the reference's window machinery
(encoder_Uformer.py:398-420 window_partition/window_reverse,
:120-136 relative-position-bias indexing, :612-631 SW-MSA shift masks), with
one structural change: everything that the reference computes **per forward
call on device** (shift masks via Python loops writing into a CUDA tensor,
bias index gathers) is computed here **once at trace time as numpy
constants** — shapes are static per Uformer stage, so there is nothing
dynamic about them.

Layout: NHWC / ``[B, H, W, C]`` images and ``[B, N, C]`` token sequences
(channels-last is the TPU-native layout; the reference is NCHW).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jax.Array, win: int) -> jax.Array:
    """``[B, H, W, C] -> [B * H/win * W/win, win, win, C]``.

    Pure reshape/transpose (free under XLA). Reference
    encoder_Uformer.py:398-409 (dilation_rate==1 branch; the dilated branch is
    never used in the reference's live configs).
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)


def window_reverse(windows: jax.Array, win: int, h: int, w: int) -> jax.Array:
    """Inverse of :func:`window_partition`. Reference encoder_Uformer.py:411-420."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // win // win)
    x = windows.reshape(b, h // win, w // win, win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


@functools.lru_cache(maxsize=32)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """``[wh*ww, wh*ww]`` int32 index into a ``(2wh-1)(2ww-1)`` bias table.

    Reference encoder_Uformer.py:124-135 (identical construction in the
    decoder, decoder_Uformer.py:200-211).
    """
    coords_h = np.arange(wh)
    coords_w = np.arange(ww)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"))  # [2, wh, ww]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=64)
def shift_attn_mask(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """Additive SW-MSA mask ``[nW, win*win, win*win]`` float32 (0 or -100).

    The reference rebuilds this on-device inside every block forward
    (encoder_Uformer.py:613-631); shapes are static per stage, so we build it
    once on host. Masked (cross-region) pairs get ``-100.0`` exactly as the
    reference does — not ``-inf`` — which matters for parity because ``-100``
    leaves ~e^-100 probability mass in place.
    """
    img = np.zeros((h, w), dtype=np.float32)
    cnt = 0
    slices = (slice(0, -win), slice(-win, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(h // win, win, w // win, win).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, win * win)  # [nW, N]
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, np.float32(-100.0), np.float32(0.0))


@functools.lru_cache(maxsize=8)
def band_mask(L: int, n_tokens: int, kind: str) -> np.ndarray:
    """Intra/inter frequency-band additive mask ``[L*n, L*n]`` float32.

    ``kind='intra'``: 0 on same-band block-diagonal, -100 elsewhere;
    ``kind='inter'``: complement. Reference encoder_Uformer.py:246-254.
    """
    if kind == "intra":
        blocks = np.where(np.eye(L, dtype=bool), 0.0, -100.0)
    elif kind == "inter":
        blocks = np.where(np.eye(L, dtype=bool), -100.0, 0.0)
    else:
        raise ValueError(f"band mask kind must be intra/inter, got {kind!r}")
    return np.kron(blocks, np.ones((n_tokens, n_tokens))).astype(np.float32)


def gather_relative_bias(table: jax.Array, wh: int, ww: int) -> jax.Array:
    """``table[(2wh-1)(2ww-1), nH] -> [nH, wh*ww, wh*ww]`` bias.

    Reference encoder_Uformer.py:158-160.
    """
    idx = jnp.asarray(relative_position_index(wh, ww))
    bias = table[idx.reshape(-1)].reshape(wh * ww, wh * ww, -1)
    return bias.transpose(2, 0, 1)
