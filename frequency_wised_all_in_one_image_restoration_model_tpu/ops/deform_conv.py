"""Modulated deformable convolution v2 (fused-gather bilinear composite).

The reference depends on ``mmcv.ops.modulated_deform_conv2d`` — a CUDA C++
kernel — but ships it disabled: the import is commented out and the layer's
forward hits ``assert False`` (reference net/utils/deform_conv.py:7, 64-67),
so every DGRN/DGM and ``deform_conv``-injection forward crashes as shipped.
This module provides a *working* TPU-native implementation: bilinear
sampling at deformed locations + one big MXU matmul over the ``K*Cin``
column buffer (im2col with deformed taps).

Sampling is ONE flat row-gather, not four: the image is zero-padded by one
pixel and the four bilinear corners are pre-concatenated on the channel
axis (base / +x / +y / +x+y static shifts of the padded image), so a
single ``jnp.take`` row fetch returns all four corner values, and the pad
makes bilinear-of-zero-padding exact with NO validity masks (coords
clipped to [-1, H] sample the pad ring, which contributes exactly 0).

Perf reality measured on v5e: XLA TPU gathers are BYTE-bound at ~64 GB/s
(flat ``take``; batched ``take_along_axis`` only manages ~32) regardless
of row width — fusing four gathers into one moves the same bytes; this
composite measures 18.4 ms for B=8 x 128^2 x 64ch (a plain 3x3 conv of
the same shape is ~2 ms). Gathers inside a Pallas kernel are not an
option either: Mosaic's ``tpu.dynamic_gather`` supports only a single
source vreg along the gather dimension. The alternative
:mod:`..ops.pallas.dcn` — a GATHER-FREE kernel that clamps offsets to a
radius R and decomposes bilinear sampling into static VMEM shifts with
triangular-hat weights (exactly equal to this composite evaluated on
clamped offsets) — measures 35.6 ms at the same shape (the 25-shift hat
decomposition is ~6x the VPU work of 4 bilinear corners), so THIS module
is the default TPU path; the kernel stays opt-in (FAIRM_DCN_KERNEL=1).

Semantics follow DCNv2: sampling location for output pixel ``p`` and kernel
tap ``k`` is ``p + k_offset + Δp_k`` with learned per-pixel ``Δp_k`` and a
sigmoid modulation scalar per tap; out-of-bounds samples read as zero.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def use_dcn_kernel() -> bool:
    """Gather-free Pallas DCN (ops/pallas/dcn.py): opt-in via
    FAIRM_DCN_KERNEL=1. Default OFF — measured on v5e (2026-08-17,
    tools/op_bench.py dcn, B=8 x 128^2 x 64ch): the kernel runs 35.6 ms
    vs the exact gather composite's 18.4 ms; its 25-shift hat
    decomposition costs ~6x the VPU mul-adds of the 4-corner gather and
    the dynamic-slice loop is latency-bound. The composite is also EXACT
    (no offset clamp). FAIRM_DCN_R sets the kernel's clamp radius
    (default 2; see PARITY.md)."""
    flag = os.environ.get("FAIRM_DCN_KERNEL")
    if flag is not None:
        return flag not in ("0", "false", "False")
    return False


def _dcn_r() -> int:
    return int(os.environ.get("FAIRM_DCN_R", "2"))


def _bilinear_gather(x: jax.Array, yy: jax.Array, xx: jax.Array) -> jax.Array:
    """Sample ``x [B, H, W, C]`` at float coords ``yy/xx [B, P]``.

    Zero padding outside the image. Returns ``[B, P, C]``.
    """
    b, h, w, c = x.shape
    p = yy.shape[1]

    # 1-px zero pad; corner values as channel groups over the (H+1)x(W+1)
    # base grid — one gathered row carries all 4 bilinear corners
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 1, w + 1                      # base-grid extent
    xc = jnp.concatenate([
        xp[:, :hp, :wp], xp[:, :hp, 1:], xp[:, 1:, :wp], xp[:, 1:, 1:],
    ], axis=-1).reshape(b * hp * wp, 4 * c)

    # clip to [-1, H]/[-1, W]: everything at or beyond the rim samples the
    # zero pad with zero effective weight — exact zero, mask-free. The
    # BASE corner is additionally clipped to H-1 (at yyc == H the fraction
    # becomes 1, putting all weight on the +1 pad corner), which keeps
    # every gathered row strictly inside the (H+1)x(W+1) base grid.
    yyc = jnp.clip(yy, -1.0, float(h))
    xxc = jnp.clip(xx, -1.0, float(w))
    y0 = jnp.clip(jnp.floor(yyc), -1.0, float(h - 1))
    x0 = jnp.clip(jnp.floor(xxc), -1.0, float(w - 1))
    fy = (yyc - y0)[..., None]
    fx = (xxc - x0)[..., None]

    base = (jnp.arange(b, dtype=jnp.int32) * (hp * wp))[:, None]
    idx = ((y0 + 1).astype(jnp.int32) * wp + (x0 + 1).astype(jnp.int32)
           + base)                              # [B, P] padded-coord rows
    rows = jnp.take(xc, idx.reshape(-1), axis=0,
                    mode="clip").reshape(b, p, 4, c)

    fy = fy.astype(x.dtype)
    fx = fx.astype(x.dtype)
    return (rows[:, :, 0] * (1 - fy) * (1 - fx)
            + rows[:, :, 1] * (1 - fy) * fx
            + rows[:, :, 2] * fy * (1 - fx)
            + rows[:, :, 3] * fy * fx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _dcn_fast(x, offset, mask, weight, bias, R, padding, dilation):
    from .pallas.dcn import dcn_shift_kernel

    return dcn_shift_kernel(x, offset, mask, weight, bias, R=R,
                            padding=padding, dilation=dilation)


def _dcn_fast_fwd(x, offset, mask, weight, bias, R, padding, dilation):
    out = _dcn_fast(x, offset, mask, weight, bias, R, padding, dilation)
    return out, (x, offset, mask, weight, bias)


def _dcn_fast_bwd(R, padding, dilation, res, g):
    # the kernel == the exact composite evaluated on clamped offsets
    # (tests assert this), so its true gradient is the composite's
    x, offset, mask, weight, bias = res

    def f(x, offset, mask, weight, bias):
        off_c = jnp.clip(offset, -float(R), float(R))
        return _exact_dcn(x, off_c, mask, weight, bias, 1, padding, dilation)

    _, vjp = jax.vjp(f, x, offset, mask, weight, bias)
    return vjp(g.astype(jnp.float32) if g.dtype != x.dtype else g)


_dcn_fast.defvjp(_dcn_fast_fwd, _dcn_fast_bwd)


def modulated_deform_conv2d(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """DCNv2 forward: exact gather composite by default; opt-in dispatch
    to the gather-free Pallas kernel (FAIRM_DCN_KERNEL=1; stride-1,
    centered taps; offsets clamped to ±FAIRM_DCN_R, default 2 —
    PARITY.md)."""
    kh, kw = weight.shape[0], weight.shape[1]
    centered = padding == (kh // 2) * dilation == (kw // 2) * dilation
    # 16-bit only: the kernel's unrolled shift temporaries double at fp32
    # and blow the VMEM stack; fp32 (PSNR-parity eval) keeps the exact path.
    # VMEM guard: the kernel precomputes 2S+1 column-rolled fp32 copies in
    # scratch — wide-C shapes (deform_conv injection at deep decoder dims)
    # would not fit, so they keep the exact path too.
    fits = False
    if (stride == 1 and centered and use_dcn_kernel()
            and jnp.dtype(x.dtype).itemsize == 2):
        # only the opt-in 16-bit path pays the kernel import + scratch sizing
        from .pallas.dcn import scratch_bytes

        fits = scratch_bytes(x.shape, kh, _dcn_r(), dilation) <= (10 << 20)
    if fits:
        b = bias if bias is not None else jnp.zeros(
            (weight.shape[-1],), jnp.float32)
        return _dcn_fast(x, offset, mask, weight, b, _dcn_r(), padding,
                         dilation)
    return _exact_dcn(x, offset, mask, weight, bias, stride, padding,
                      dilation)


def _exact_dcn(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """DCNv2 forward (exact unbounded offsets; im2col + fused gather).

    Args:
      x: ``[B, H, W, Cin]``.
      offset: ``[B, Ho, Wo, 2*K]`` — all K Δy's then all K Δx's (the layout
        the reference's offset head produces: ``cat((o1, o2), dim=1)``,
        deform_conv.py:59-61).
      mask: ``[B, Ho, Wo, K]`` modulation scalars (already sigmoided).
      weight: ``[kh, kw, Cin, Cout]`` (HWIO).
      bias: ``[Cout]`` or None.

    Returns ``[B, Ho, Wo, Cout]``.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    ho, wo = offset.shape[1], offset.shape[2]
    p = ho * wo

    oy = offset[..., :k].reshape(b, p, k).astype(jnp.float32)
    ox = offset[..., k:].reshape(b, p, k).astype(jnp.float32)
    m = mask.reshape(b, p, k)

    base_y = (jnp.arange(ho, dtype=jnp.float32)[:, None] * stride - padding)
    base_x = (jnp.arange(wo, dtype=jnp.float32)[None, :] * stride - padding)
    base_y = jnp.broadcast_to(base_y, (ho, wo)).reshape(-1)  # [P]
    base_x = jnp.broadcast_to(base_x, (ho, wo)).reshape(-1)

    # per-tap kernel-grid offsets [K]
    tap_y = (jnp.arange(kh, dtype=jnp.float32) * dilation)[:, None]
    tap_x = (jnp.arange(kw, dtype=jnp.float32) * dilation)[None, :]
    tap_y = jnp.broadcast_to(tap_y, (kh, kw)).reshape(-1)
    tap_x = jnp.broadcast_to(tap_x, (kh, kw)).reshape(-1)

    # all sampling coords at once: [B, P*K] — ONE fused gather
    yy = (base_y[None, :, None] + tap_y[None, None, :] + oy).reshape(b, p * k)
    xx = (base_x[None, :, None] + tap_x[None, None, :] + ox).reshape(b, p * k)
    sample = _bilinear_gather(x, yy, xx)  # [B, P*K, Cin]
    col = sample.reshape(b, p, k, cin) * m[..., None].astype(sample.dtype)

    # one MXU contraction over (K, Cin)
    out = jnp.einsum("bpkc,kco->bpo", col, weight.reshape(k, cin, cout),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(b, ho, wo, cout)
