"""Gather-free Pallas kernel for modulated deformable conv (DCNv2).

Replaces the reference's ``mmcv.ops.modulated_deform_conv2d`` CUDA kernel
(reference net/utils/deform_conv.py:10-67, shipped disabled behind
``assert False``). Why not a gather kernel: measured on v5e, XLA TPU
gathers are byte-bound at ~64 GB/s (the im2col composite in
ops/deform_conv.py costs ~40 ms for B=8 x 128^2 x 64ch vs ~2 ms for a
plain 3x3 conv), and Mosaic's ``tpu.dynamic_gather`` supports only a
single source vreg along the gather dimension, so an in-kernel gather
cannot address a whole image.

This kernel removes the gather algebraically. With per-pixel tap offsets
``Δ`` clamped to ``[-R, R]``, bilinear sampling at ``p + k + Δ`` is a sum
over a STATIC (2R+3)^2 shift neighborhood with triangular-hat weights:

    x(p + k + Δ) = Σ_s  x[p + s] · tri(k_y + Δ_y − s_y) · tri(k_x + Δ_x − s_x)

where ``tri(t) = max(0, 1 − |t|)`` — nonzero for at most 2 integers per
axis, so the decomposition is EXACT (identical to the im2col composite
evaluated on clamped offsets; tests assert this). Static shifts are free
VMEM slices; the modulated column buffer then hits the MXU once against
the ``[K·Cin, Cout]`` weight. Offsets in DGRN are zero-initialized and
stay small, so the clamp (default R=2, configurable) is the production
semantics; ``max_offset=None`` in the public wrapper keeps the exact
unbounded path.

Layout: grid ``(B, H/T)``; the row-halo (R+1 rows each side) comes from
passing x under three pipelined BlockSpecs (previous/current/next row
block — same pattern as ops/pallas/leff.py), with out-of-image halo rows
zeroed in-kernel to preserve zero padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tri(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _kernel(prev_ref, cur_ref, next_ref, off_ref, mask_ref, w_ref, b_ref,
            out_ref, *, T: int, W: int, C: int, Cout: int, K: int,
            kh: int, kw: int, R: int, pad: int, dil: int, has_bias: bool):
    i = pl.program_id(1)
    # max |shift| per axis: tap reach (dil * kh//2) + offset clamp R +
    # 1 bilinear corner; for 3x3/pad=1/R=2 the shift range is [-4, 4]
    S = R + 1 + dil * (kh // 2)
    Rh = S                                   # row halo each side

    x = jnp.concatenate(
        [prev_ref[0, T - Rh:], cur_ref[0], next_ref[0, :Rh]], axis=0)
    # zero out-of-image halo rows (edge blocks carry clamped duplicates)
    rows = jax.lax.broadcasted_iota(jnp.int32, (T + 2 * Rh, 1, 1), 0)
    grow = rows + i * T - Rh                 # global row index
    nI = pl.num_programs(1)
    x = jnp.where((grow < 0) | (grow >= nI * T), 0.0, x)
    # zero-pad width by S in-register
    zcol = jnp.zeros((T + 2 * Rh, S, C), x.dtype)
    xp = jnp.concatenate([zcol, x, zcol], axis=1)   # [T+2S, W+2S, C]

    off = off_ref[0]                          # [T, W, 2K] (Δy's then Δx's)
    m = mask_ref[0]                           # [T, W, K]
    oy = jnp.clip(off[..., :K].astype(jnp.float32), -float(R), float(R))
    ox = jnp.clip(off[..., K:].astype(jnp.float32), -float(R), float(R))

    cols = []
    for k in range(K):
        # tap offset relative to the output pixel (3x3/pad=1 -> -1,0,1);
        # the wrapper asserts centered padding (pad == (kh//2)*dil)
        ky = (k // kw) * dil - pad
        kx = (k % kw) * dil - pad
        ry = oy[..., k] + ky                  # [T, W]
        rx = ox[..., k] + kx
        acc = jnp.zeros((T, W, C), jnp.float32)
        for sy in range(ky - (R + 1), ky + R + 2):
            ty = _tri(ry - sy)
            for sx in range(kx - (R + 1), kx + R + 2):
                wgt = (ty * _tri(rx - sx))[..., None]
                sl = xp[Rh + sy:Rh + sy + T, S + sx:S + sx + W]
                acc = acc + sl.astype(jnp.float32) * wgt
        cols.append(acc * m[..., k:k + 1].astype(jnp.float32))

    col = jnp.stack(cols, axis=2).reshape(T * W, K * C)
    out = jax.lax.dot_general(
        col.astype(w_ref.dtype), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if has_bias:
        out = out + b_ref[...]
    out_ref[...] = out.reshape(1, T, W, Cout).astype(out_ref.dtype)


def _choose_t(H: int, S: int) -> int:
    """Rows per tile: need T >= S for single-neighbor halo; keep the
    VMEM-resident column buffer (~T*W*K*C fp32) modest via the caller's
    shapes — T=16 divides every DGRN resolution and satisfies S<=8."""
    t = min(H, 16)
    while H % t != 0 or t < S:
        t += 1
        if t > H:
            return H
    return t


def dcn_shift_kernel(x, offset, mask, weight, bias=None, *, R: int = 2,
                     padding: int = 1, dilation: int = 1,
                     interpret: bool = False):
    """Clamped-offset DCNv2 forward (stride 1).

    Args match ops/deform_conv.py:modulated_deform_conv2d; offsets are
    clamped to ``[-R, R]``. Returns ``[B, H, W, Cout]``.
    """
    b, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    assert padding == (kh // 2) * dilation == (kw // 2) * dilation, \
        "kernel assumes centered taps (pad == (k//2)*dil)"
    k = kh * kw
    S = R + 1 + dilation * (kh // 2)
    T = _choose_t(h, S)
    nI = h // T

    wflat = weight.reshape(k * c, cout).astype(x.dtype)
    has_bias = bias is not None
    barr = (bias.astype(jnp.float32) if has_bias
            else jnp.zeros((cout,), jnp.float32))

    kernel = functools.partial(
        _kernel, T=T, W=w, C=c, Cout=cout, K=k, kh=kh, kw=kw, R=R,
        pad=padding, dil=dilation, has_bias=has_bias)
    xspec = lambda imap: pl.BlockSpec((1, T, w, c), imap,
                                      memory_space=pltpu.VMEM)
    vspec = lambda *shape: pl.BlockSpec(
        shape, lambda bb, ii: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, nI),
        in_specs=[
            xspec(lambda bb, ii: (bb, jnp.maximum(ii - 1, 0), 0, 0)),
            xspec(lambda bb, ii: (bb, ii, 0, 0)),
            xspec(lambda bb, ii: (bb, jnp.minimum(ii + 1, nI - 1), 0, 0)),
            pl.BlockSpec((1, T, w, 2 * k), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, w, k), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec(k * c, cout), vspec(cout),
        ],
        out_specs=pl.BlockSpec((1, T, w, cout), lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        interpret=interpret,
    )(x, x, x, offset, mask, wflat, barr)
