"""Fused LeFF (locally-enhanced feed-forward) Pallas kernel.

LeFF (reference net/leff.py:71-117) is ``linear(C->4C) - gelu - 3x3
depthwise conv - gelu - linear(4C->C)`` over image-shaped tokens. The XLA
lowering round-trips the 4C hidden tensor through HBM ~4 times (linear1
out, dwconv in/out, linear2 in) — at stage-0 flagship shapes that is
~3 GB of HBM traffic per block for ~40 GFLOP of matmul, i.e. the op is
bandwidth-bound by more than an order of magnitude.

This kernel streams row-tiles of the input image through VMEM: per tile
it runs linear1 on ``T+2`` halo rows, the 3x3 depthwise conv as 9 shifted
multiply-adds on the VMEM-resident hidden tensor (width zero-padded
in-register), and linear2 — the hidden tensor never touches HBM. The
1-row halo comes from passing x under three pipelined BlockSpecs
(previous/current/next row-block; index clamped at the image edges and
the corresponding hidden rows zeroed — DMA-slicing a lane-unaligned C
is not tileable, so halo-by-blockspec beats halo-by-manual-DMA). HBM
traffic drops to ~3 reads of x and one write of the output, vs ~9
x-equivalents unfused.

The public entry :func:`fused_leff` carries a custom VJP whose backward
recomputes the unfused XLA ops (correct; the forward dominates eval and
the recompute keeps residuals off HBM), so the kernel is usable in
training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


def _kernel(prev_ref, cur_ref, next_ref, w1_ref, b1_ref, wd_ref, bd_ref,
            w2_ref, b2_ref, out_ref, *, T: int, W: int, C: int, Hd: int,
            out_dtype):
    i = pl.program_id(1)

    # halo rows: last row of the previous block, first row of the next
    # (edge blocks carry clamped duplicates; their hidden rows are zeroed
    # below, matching the conv's zero padding)
    x = jnp.concatenate(
        [prev_ref[0, T - 1:T], cur_ref[0], next_ref[0, 0:1]], axis=0)
    x = x.reshape((T + 2) * W, C)
    h = jax.lax.dot_general(
        x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = _gelu(h + b1_ref[...])                  # [(T+2)*W, Hd] fp32
    h = h.reshape(T + 2, W, Hd)

    # the conv zero-pads the HIDDEN tensor at the image boundary, but the
    # halo rows were computed from zero-padded x (= gelu(b1), not 0): zero
    # them on the first/last row tile
    rows = jax.lax.broadcasted_iota(jnp.int32, (T + 2, 1, 1), 0)
    top = jnp.logical_and(i == 0, rows == 0)
    bot = jnp.logical_and(i == pl.num_programs(1) - 1, rows == T + 1)
    h = jnp.where(jnp.logical_or(top, bot), 0.0, h)

    # 3x3 depthwise conv, width zero-padded in-register; height halo is
    # the 2 extra rows already in VMEM
    zcol = jnp.zeros((T + 2, 1, Hd), jnp.float32)
    hp = jnp.concatenate([zcol, h, zcol], axis=1)   # [T+2, W+2, Hd]
    acc = jnp.zeros((T, W, Hd), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy, dx][None, None, :]
            acc = acc + hp[dy:dy + T, dx:dx + W] * tap
    acc = _gelu(acc + bd_ref[...])

    y = jax.lax.dot_general(
        acc.reshape(T * W, Hd).astype(out_dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2_ref[...]
    out_ref[...] = y.reshape(1, T, W, C).astype(out_ref.dtype)


def _choose_t(H: int, W: int, Hd: int) -> int:
    """Rows per tile: biggest divisor of H keeping the fp32 hidden tensor
    (~3 copies live across the conv) under ~4 MB."""
    budget = 4 << 20
    t = H
    while t > 1 and 3 * (t + 2) * (W + 2) * Hd * 4 > budget:
        # largest proper divisor
        for d in range(t // 2, 0, -1):
            if H % d == 0:
                t = d
                break
        else:
            t = 1
    return t


def _forward(x_img, w1, b1, wd, bd, w2, b2, interpret: bool,
             rows_per_tile: int = 0):
    B, H, W, C = x_img.shape
    Hd = w1.shape[1]
    T = rows_per_tile or _choose_t(H, W, Hd)
    nI = H // T
    # matmul operands must match x's dtype (bf16 production path); biases
    # and depthwise taps stay fp32 (VPU adds/muls on the fp32 hidden)
    w1 = w1.astype(x_img.dtype)
    w2 = w2.astype(x_img.dtype)
    b1, bd, b2 = (t.astype(jnp.float32) for t in (b1, bd, b2))
    wd = wd.astype(jnp.float32)

    kernel = functools.partial(_kernel, T=T, W=W, C=C, Hd=Hd,
                               out_dtype=x_img.dtype)
    vspec = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    xspec = lambda imap: pl.BlockSpec((1, T, W, C), imap,
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, nI),
        in_specs=[
            xspec(lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0)),
            xspec(lambda b, i: (b, i, 0, 0)),
            xspec(lambda b, i: (b, jnp.minimum(i + 1, nI - 1), 0, 0)),
            vspec(C, Hd), vspec(Hd), vspec(3, 3, Hd), vspec(Hd),
            vspec(Hd, C), vspec(C),
        ],
        out_specs=pl.BlockSpec((1, T, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x_img.dtype),
        interpret=interpret,
    )(x_img, x_img, x_img, w1, b1, wd, bd, w2, b2)


def _xla_reference(x_img, w1, b1, wd, bd, w2, b2):
    """Unfused XLA LeFF (backward recompute + tests)."""
    h = _gelu(jnp.einsum("bhwc,cd->bhwd", x_img, w1,
                         preferred_element_type=jnp.float32) + b1)
    h = jax.lax.conv_general_dilated(
        h, wd[..., None, :].astype(h.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=wd.shape[-1])
    h = _gelu(h + bd)
    y = jnp.einsum("bhwd,dc->bhwc", h.astype(x_img.dtype), w2,
                   preferred_element_type=jnp.float32) + b2
    return y.astype(x_img.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_leff(x_img, w1, b1, wd, bd, w2, b2, interpret: bool = False,
               rows_per_tile: int = 0):
    """``linear2(gelu(dwconv3x3(gelu(linear1(x)))))`` fused in VMEM.

    Args:
      x_img: ``[B, H, W, C]`` image-shaped tokens.
      w1: ``[C, Hd]``; b1: ``[Hd]``; wd: ``[3, 3, Hd]`` depthwise taps;
      bd: ``[Hd]``; w2: ``[Hd, C]``; b2: ``[C]``.
    Returns ``[B, H, W, C]`` in x's dtype.
    """
    return _forward(x_img, w1, b1, wd, bd, w2, b2, interpret,
                    rows_per_tile)


def _fwd(x_img, w1, b1, wd, bd, w2, b2, interpret, rows_per_tile):
    out = fused_leff(x_img, w1, b1, wd, bd, w2, b2, interpret,
                     rows_per_tile)
    return out, (x_img, w1, b1, wd, bd, w2, b2)


def _bwd(interpret, rows_per_tile, res, g):
    x_img, w1, b1, wd, bd, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a), x_img, w1, b1, wd, bd, w2, b2)
    return vjp(g)


fused_leff.defvjp(_fwd, _bwd)
