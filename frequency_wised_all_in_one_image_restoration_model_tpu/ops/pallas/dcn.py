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
evaluated on clamped offsets; tests assert this). Static shifts are VMEM
slices; each tap's modulated sample hits the MXU against its ``[C, Cout]``
weight slice. Offsets in DGRN are zero-initialized and stay small, so the
clamp (default R=2, ``FAIRM_DCN_R``) preserves semantics.

Measured on the real v5e (2026-08-17, tools/op_bench.py dcn): correct
on-chip (2.3e-3 rel err vs the clamped composite at bf16) but SLOWER —
35.6 ms vs the composite's 18.4 ms at B=8 x 128^2 x 64ch. The (2R+3)^2
hat expansion does ~6x the VPU mul-adds of 4-corner bilinear gathering,
and the per-(tap, shift) dynamic-slice loop is latency-bound (a T=16
row tile to halve the cell count exceeds scoped VMEM). The kernel is
therefore OPT-IN (``FAIRM_DCN_KERNEL=1``); the default TPU path is the
exact composite in ops/deform_conv.py. Kept as a working, tested
capability (the reference ships its DCN behind ``assert False``) and as
the template for shift-decomposition kernels.

Layout: grid ``(B, H/T, K)`` — the TAP is a grid dimension, so per-tap
offset/mask/weight blocks are selected by BlockSpec index maps (no
in-kernel dynamic lane indexing) and the per-program VMEM stack stays
small (an unrolled 9-tap loop multiplies Mosaic's per-iteration stack
allocations past the 16 MB budget). The fp32 output block is revisited
across the K grid steps and accumulated in place. The row halo (R+2 rows
each side) comes from passing x under three pipelined BlockSpecs
(previous/current/next row block — same halo pattern as the fused-block
FFN kernel, ops/pallas/lewin_block.py),
with out-of-image halo rows zeroed in-kernel to preserve zero padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tri(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _kernel(prev_ref, cur_ref, next_ref, off_ref, mask_ref, w_ref,
            out_ref, xro_ref, *, T: int, W: int, C: int, Cout: int,
            kh: int, kw: int, R: int, pad: int, dil: int):
    i = pl.program_id(1)
    k = pl.program_id(2)
    # max |shift| per axis: tap reach (dil * kh//2) + offset clamp R +
    # 1 bilinear corner; for 3x3/pad=1/R=2 the shift range is [-4, 4]
    S = R + 1 + dil * (kh // 2)
    Rh = S                                   # row halo each side
    n_s = 2 * R + 3                          # shifts per axis per tap

    @pl.when(k == 0)
    def _():
        x = jnp.concatenate(
            [prev_ref[0, T - Rh:], cur_ref[0], next_ref[0, :Rh]], axis=0)
        # zero out-of-image halo rows (edge blocks carry clamped rows)
        rows = jax.lax.broadcasted_iota(jnp.int32, (T + 2 * Rh, 1, 1), 0)
        grow = rows + i * T - Rh             # global row index
        nI = pl.num_programs(1)
        x = jnp.where((grow < 0) | (grow >= nI * T), 0.0, x)
        # Precompute ALL 2S+1 column-rolled fp32 copies ONCE per row
        # block, with STATIC shifts. Per-tap dynamic rotates were the
        # kernel's cost (measured 48 ms vs the composite's 19 at the
        # DGRN shape — ~45 latency-bound rotates per grid cell); a
        # static roll at k==0 amortizes over all K taps. fp32 because
        # Mosaic's rotate doesn't take 16-bit data, and the hat-weight
        # mul-accumulate wants fp32 anyway.
        xf = x.astype(jnp.float32)
        for s in range(-S, S + 1):
            xro_ref[s + S] = pltpu.roll(xf, (-s) % W, axis=1)
        out_ref[...] = jnp.zeros_like(out_ref)

    # tap offset relative to the output pixel (3x3/pad=1 -> -1,0,1);
    # the wrapper asserts centered padding (pad == (kh//2)*dil)
    ky = (k // kw) * dil - pad
    kx = (k % kw) * dil - pad
    oy = jnp.clip(off_ref[0, 0, 0].astype(jnp.float32),
                  -float(R), float(R))       # [T, W]
    ox = jnp.clip(off_ref[0, 1, 0].astype(jnp.float32),
                  -float(R), float(R))
    ry = oy + ky.astype(jnp.float32)
    rx = ox + kx.astype(jnp.float32)
    m = mask_ref[0, 0]                       # [T, W]

    # fori over ROW shifts (pl.ds dynamic start — the row dim is untiled,
    # any start is legal) with the 2R+3 COLUMN shifts unrolled inside: a
    # flat (2R+3)^2 fori is latency-bound (~0.7 us per tiny body), while a
    # fully unrolled loop stack-allocates past the VMEM budget. Column
    # shifts are dynamic leading-dim picks from the precomputed rolled
    # copies (no rotate in the hot loop); wrapped columns are killed by
    # the in-bounds factor folded into the hat weight.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)

    def row_body(u, acc):
        sy = ky + u - (R + 1)                 # traced row shift
        ty = _tri(ry - sy.astype(jnp.float32))
        for v in range(n_s):
            sx = kx + (v - (R + 1))           # traced column shift
            inb = (col_ids + sx >= 0) & (col_ids + sx < W)
            wgt = (ty * _tri(rx - sx.astype(jnp.float32)))[..., None] * inb
            rows = xro_ref[sx + S, pl.ds(Rh + sy, T)]   # [T, W, C] fp32
            acc = acc + rows * wgt
        return acc

    acc = jax.lax.fori_loop(
        0, n_s, row_body, jnp.zeros((T, W, C), jnp.float32))
    acc = acc * m[..., None].astype(jnp.float32)
    out_ref[...] += jax.lax.dot_general(
        acc.reshape(T * W, C).astype(w_ref.dtype), w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(1, T, W, Cout)


def scratch_bytes(x_shape, kh: int, R: int, dilation: int) -> int:
    """VMEM bytes of the rolled-copies scratch for this shape (used by the
    dispatch guard in ops/deform_conv.py)."""
    _, h, w, c = x_shape
    S = R + 1 + dilation * (kh // 2)
    T = _choose_t(h, S)
    return (2 * S + 1) * (T + 2 * S) * w * c * 4


def _choose_t(H: int, S: int) -> int:
    """Rows per tile: need T >= S for the single-neighbor halo, T a
    multiple of 8 (TPU sublane tiling), and small — the unrolled shift
    temporaries scale with T on Mosaic's VMEM stack (T=16 at the DGRN
    shape exceeds the 16 MB scoped-VMEM limit by 1.4 MB, measured)."""
    t = min(H, max(8, ((S + 7) // 8) * 8))
    while H % t != 0 or t < S:
        t += 8
        if t >= H:
            return H
    return t


def dcn_shift_kernel(x, offset, mask, weight, bias=None, *, R: int = 2,
                     padding: int = 1, dilation: int = 1,
                     interpret: bool | None = None):
    """Clamped-offset DCNv2 forward (stride 1).

    Args match ops/deform_conv.py:modulated_deform_conv2d; offsets are
    clamped to ``[-R, R]``. Returns ``[B, H, W, Cout]`` in x's dtype.
    ``interpret=None`` auto-selects Pallas interpret mode off-TPU so the
    kernel (and the custom VJP routed through it) runs in CPU tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    assert padding == (kh // 2) * dilation == (kw // 2) * dilation, \
        "kernel assumes centered taps (pad == (k//2)*dil)"
    k = kh * kw
    S = R + 1 + dilation * (kh // 2)
    T = _choose_t(h, S)
    nI = h // T

    # tap-major layouts so the K grid dim selects per-tap blocks
    off_t = offset.reshape(b, h, w, 2, k).transpose(0, 3, 4, 1, 2)
    mask_t = mask.transpose(0, 3, 1, 2)              # [B, K, H, W]
    w_t = weight.reshape(k, c, cout).astype(x.dtype)

    kernel = functools.partial(
        _kernel, T=T, W=w, C=c, Cout=cout, kh=kh, kw=kw, R=R,
        pad=padding, dil=dilation)
    xspec = lambda imap: pl.BlockSpec((1, T, w, c), imap,
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, nI, k),
        in_specs=[
            xspec(lambda bb, ii, kk: (bb, jnp.maximum(ii - 1, 0), 0, 0)),
            xspec(lambda bb, ii, kk: (bb, ii, 0, 0)),
            xspec(lambda bb, ii, kk: (bb, jnp.minimum(ii + 1, nI - 1), 0, 0)),
            pl.BlockSpec((1, 2, 1, T, w),
                         lambda bb, ii, kk: (bb, 0, kk, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, w), lambda bb, ii, kk: (bb, kk, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, cout), lambda bb, ii, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, w, cout),
                               lambda bb, ii, kk: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * S + 1, T + 2 * S, w, c),
                                   jnp.float32)],
        interpret=interpret,
    )(x, x, x, off_t, mask_t, w_t)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
