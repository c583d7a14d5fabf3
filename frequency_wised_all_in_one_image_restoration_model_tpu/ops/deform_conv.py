"""Modulated deformable convolution v2 (gather + bilinear composite).

The reference depends on ``mmcv.ops.modulated_deform_conv2d`` — a CUDA C++
kernel — but ships it disabled: the import is commented out and the layer's
forward hits ``assert False`` (reference net/utils/deform_conv.py:7, 64-67),
so every DGRN/DGM and ``deform_conv``-injection forward crashes as shipped.
This module provides a *working* TPU-native implementation:

* correctness path (here): per-tap bilinear sampling built from 4 gathers
  (``take_along_axis`` over flattened spatial) + one big MXU matmul over the
  ``K*Cin`` column buffer — the classic im2col formulation with deformed
  sampling locations;
* perf path (ops/pallas): VMEM-tiled kernel, added once parity is green.

Semantics follow DCNv2: sampling location for output pixel ``p`` and kernel
tap ``k`` is ``p + k_offset + Δp_k`` with learned per-pixel ``Δp_k`` and a
sigmoid modulation scalar per tap; out-of-bounds samples read as zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(img_flat: jax.Array, yy: jax.Array, xx: jax.Array,
                     h: int, w: int) -> jax.Array:
    """Sample ``img_flat [B, H*W, C]`` at float coords ``yy/xx [B, P]``.

    Zero padding outside the image. Returns ``[B, P, C]``.
    """
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy = (yy - y0)[..., None]
    wx = (xx - x0)[..., None]

    out = None
    for dy, sy in ((0, 1.0), (1, 0.0)):
        for dx, sx in ((0, 1.0), (1, 0.0)):
            cy = y0 + dy
            cx = x0 + dx
            valid = ((cy >= 0) & (cy <= h - 1) & (cx >= 0) & (cx <= w - 1))
            cyc = jnp.clip(cy, 0, h - 1).astype(jnp.int32)
            cxc = jnp.clip(cx, 0, w - 1).astype(jnp.int32)
            idx = cyc * w + cxc  # [B, P]
            vals = jnp.take_along_axis(img_flat, idx[..., None], axis=1)
            weight = (jnp.abs(sy - wy)) * (jnp.abs(sx - wx)) * valid[..., None]
            contrib = vals * weight.astype(img_flat.dtype)
            out = contrib if out is None else out + contrib
    return out


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
    """DCNv2 forward.

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

    x_flat = x.reshape(b, h * w, cin)

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

    # all sampling coords at once: [B, P*K] — 4 gathers total, not 4*K
    yy = (base_y[None, :, None] + tap_y[None, None, :] + oy).reshape(b, p * k)
    xx = (base_x[None, :, None] + tap_x[None, None, :] + ox).reshape(b, p * k)
    sample = _bilinear_gather(x_flat, yy, xx, h, w)  # [B, P*K, Cin]
    col = sample.reshape(b, p, k, cin) * m[..., None].astype(sample.dtype)

    # one MXU contraction over (K, Cin)
    out = jnp.einsum("bpkc,kco->bpo", col, weight.reshape(k, cin, cout),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(b, ho, wo, cout)
