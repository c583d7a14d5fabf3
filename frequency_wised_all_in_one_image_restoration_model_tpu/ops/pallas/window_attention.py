"""Fused window attention Pallas kernel.

Motivation (measured on v5e): the XLA lowering of window attention —
``softmax(q k^T * s + bias + mask) v`` over tens of thousands of tiny
64-token windows — materializes the ``[W, h, 64, 64]`` logits in HBM and
runs at ~2.5 TFLOP/s (~1% MXU). This kernel:

* keeps q/k/v blocks, logits, and the softmax entirely in VMEM (zero HBM
  traffic for the attention matrix);
* packs ``P = 128 // n`` windows into one MXU tile (64-token windows pair up
  into 128-row matmuls — the cross-window logits are masked to -1e9, which
  softmax turns into exact zeros, so the packed AV product is exact);
* adds the relative-position bias (per head, broadcast over windows) and the
  SW-MSA shift mask (per window-position, cycling every ``nW`` windows)
  inside the kernel;
* upholds the reference's additive ``-100`` shift-mask semantics
  (encoder_Uformer.py:630) — only the *packing* mask uses -1e9.

The public entry :func:`fused_window_attention` carries a custom VJP whose
backward is ALSO fused (:func:`_backward`): probs are recomputed in VMEM
with the same window packing, and dv/dp/dlogits/dq/dk never touch HBM;
dbias accumulates across sequential grid steps into a revisited block.
Shapes the packer cannot tile fall back to a plain-XLA backward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .partition import spmd_call as _spmd_call


def _pack_factor(n: int) -> int:
    return max(1, 128 // n)


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
            scale: float, P: int, G: int, nW: int, has_mask: bool):
    # q_ref: [G*P, h, n, d]; k_ref/v_ref: [G*P, h, nk, d]
    # bias_ref: [h, P*n, P*nk] pre-packed (bias tiled + cross-window -1e9)
    # mask_ref: [G, P*n, P*nk] pre-packed block-diagonal shift masks
    _, h, n, d = q_ref.shape
    nk = k_ref.shape[2]

    for hh in range(h):
        bias_h = bias_ref[hh]
        for g in range(G):
            q = q_ref[g * P:(g + 1) * P, hh].reshape(P * n, d)
            k = k_ref[g * P:(g + 1) * P, hh].reshape(P * nk, d)
            v = v_ref[g * P:(g + 1) * P, hh].reshape(P * nk, d)
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = logits + bias_h
            if has_mask:
                logits = logits + mask_ref[g]
            logits = logits - jnp.max(logits, axis=-1, keepdims=True)
            probs = jnp.exp(logits)
            probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                probs.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[g * P:(g + 1) * P, hh] = out.reshape(P, n, d).astype(
                out_ref.dtype)


def _choose_pg(w: int, n: int, h: int, d: int, nk: int, nW: int,
               has_mask: bool, itemsize: int):
    """Pick (P windows per MXU tile, G tile-groups per program) so that the
    per-program block is big enough to amortize grid-step overhead while
    staying well under VMEM (qkv/out blocks are double-buffered; bias and
    the packed mask block are VMEM-resident too; logits live on the kernel
    stack)."""
    P = _pack_factor(n)
    if w % P != 0 or (has_mask and nW % P != 0):
        P = 1
    G = 1

    def block_bytes(g):
        return g * P * h * max(n, nk) * d * itemsize

    def mask_bytes(g):
        return g * (P * n) * (P * nk) * 4 if has_mask else 0

    # conservative caps, empirically validated on v5e: the g/h loops are
    # unrolled, so Mosaic stack-allocates logits/probs temporaries PER
    # ITERATION — large G blows the 16 MB scoped-VMEM budget even when the
    # io blocks are small
    while (G < 32 and w % (P * G * 2) == 0
           and (not has_mask or nW % (P * G * 2) == 0 or (P * G * 2) % nW == 0)
           and block_bytes(G * 2) <= (1 << 18)
           and G * 2 * h * (P * n) * (P * nk) * 4 <= (4 << 20)
           and mask_bytes(G * 2) <= (1 << 18)):
        G *= 2
    return P, G


def _pack_bias(bias, P: int) -> jax.Array:
    """[h, n, nk] -> [h, P*n, P*nk]: bias tiled over diagonal blocks,
    cross-window blocks set to -1e9 (exact zero after softmax)."""
    h, n, nk = bias.shape
    row_win = np.arange(P * n)[:, None] // n
    col_win = np.arange(P * nk)[None, :] // nk
    pack = jnp.asarray(np.where(row_win == col_win, 0.0, -1e9)
                       .astype(np.float32))
    return jnp.tile(bias.astype(jnp.float32), (1, P, P)) + pack[None]


def _pack_mask(mask, P: int) -> jax.Array:
    """[nW, n, nk] -> [nW/P, P*n, P*nk]: P consecutive window masks on the
    diagonal blocks, zeros elsewhere (cross blocks already killed by the
    packed bias)."""
    nW, n, nk = mask.shape
    m = mask.astype(jnp.float32).reshape(nW // P, P, n, nk)
    out = jnp.zeros((nW // P, P * n, P * nk), jnp.float32)
    for p in range(P):
        out = out.at[:, p * n:(p + 1) * n, p * nk:(p + 1) * nk].set(m[:, p])
    return out


def _forward(q, k, v, bias, mask, scale: float, nW: int, interpret: bool):
    w, h, n, d = q.shape
    nk = k.shape[2]
    has_mask = mask is not None
    P, G = _choose_pg(w, n, h, d, nk, nW, has_mask, q.dtype.itemsize)
    PG = P * G
    grid = (w // PG,)

    bias_packed = _pack_bias(bias, P)

    if not has_mask:
        # unread placeholder (the kernel never touches mask_ref without a
        # mask); keep it one tile so it doesn't scale VMEM with G
        mask_arr = jnp.zeros((1, P * n, P * nk), jnp.float32)
        mask_spec = pl.BlockSpec((1, P * n, P * nk), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_arr = _pack_mask(mask, P)  # [nW/P, P*n, P*nk]
        if PG <= nW:
            nblocks = (nW // P) // G
            mask_spec = pl.BlockSpec((G, P * n, P * nk),
                                     lambda i: (i % nblocks, 0, 0),
                                     memory_space=pltpu.VMEM)
        else:
            # program spans >= one full image's windows: tile the whole mask
            reps = PG // nW
            mask_arr = jnp.tile(mask_arr, (reps, 1, 1))
            mask_spec = pl.BlockSpec((G, P * n, P * nk),
                                     lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, scale=scale, P=P, G=G, nW=nW,
                               has_mask=has_mask)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((PG, h, n, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PG, h, nk, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PG, h, nk, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, P * n, P * nk), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=pl.BlockSpec((PG, h, n, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w, h, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias_packed, mask_arr)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *,
                scale: float, P: int, G: int, nW: int, has_mask: bool):
    """Fused backward: recompute probs in VMEM, then the five products
    dv = p^T g, dp = g v^T, dl = p*(dp - rowsum(dp*p)), dq = dl k, dk =
    dl^T q — zero HBM traffic for probs/dp/dl. dbias accumulates across
    sequential grid steps into a revisited block (constant index map)."""
    _, h, n, d = q_ref.shape
    nk = k_ref.shape[2]
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for hh in range(h):
        bias_h = bias_ref[hh]
        db = jnp.zeros((P * n, P * nk), jnp.float32)
        for g in range(G):
            q = q_ref[g * P:(g + 1) * P, hh].reshape(P * n, d)
            k = k_ref[g * P:(g + 1) * P, hh].reshape(P * nk, d)
            v = v_ref[g * P:(g + 1) * P, hh].reshape(P * nk, d)
            gg = g_ref[g * P:(g + 1) * P, hh].reshape(P * n, d)

            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = logits + bias_h
            if has_mask:
                logits = logits + mask_ref[g]
            logits = logits - jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits)
            p = e / jnp.sum(e, axis=-1, keepdims=True)

            dv = jax.lax.dot_general(  # p^T g : [P*nk, d]
                p, gg.astype(jnp.float32),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(  # g v^T : [P*n, P*nk]
                gg.astype(jnp.float32), v.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dq = jax.lax.dot_general(  # dl k : [P*n, d]
                dl, k.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(  # dl^T q : [P*nk, d]
                dl, q.astype(jnp.float32),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

            dq_ref[g * P:(g + 1) * P, hh] = dq.reshape(P, n, d).astype(
                dq_ref.dtype)
            dk_ref[g * P:(g + 1) * P, hh] = dk.reshape(P, nk, d).astype(
                dk_ref.dtype)
            dv_ref[g * P:(g + 1) * P, hh] = dv.reshape(P, nk, d).astype(
                dv_ref.dtype)
            db = db + dl
        dbias_ref[hh] += db


def _backward(q, k, v, bias, mask, g, scale: float, nW: int,
              interpret: bool):
    w, h, n, d = q.shape
    nk = k.shape[2]
    has_mask = mask is not None
    # the backward holds ~3 packed-logit temporaries per unrolled iter where
    # the forward holds ~2; reuse the forward's block picker with its caps
    # and halve G once more for headroom
    P, G = _choose_pg(w, n, h, d, nk, nW, has_mask, q.dtype.itemsize)
    if G > 1:
        G //= 2
    if P == 1 and (w % (P * G) != 0):
        G = 1
    PG = P * G
    if w % PG != 0:
        return None  # caller falls back to the XLA backward
    grid = (w // PG,)

    bias_packed = _pack_bias(bias, P)
    if not has_mask:
        mask_arr = jnp.zeros((1, P * n, P * nk), jnp.float32)
        mask_spec = pl.BlockSpec((1, P * n, P * nk), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_arr = _pack_mask(mask, P)
        if PG <= nW:
            if (nW // P) % G != 0:
                return None
            nblocks = (nW // P) // G
            mask_spec = pl.BlockSpec((G, P * n, P * nk),
                                     lambda i: (i % nblocks, 0, 0),
                                     memory_space=pltpu.VMEM)
        else:
            reps = PG // nW
            mask_arr = jnp.tile(mask_arr, (reps, 1, 1))
            mask_spec = pl.BlockSpec((G, P * n, P * nk),
                                     lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM)

    kernel = functools.partial(_bwd_kernel, scale=scale, P=P, G=G, nW=nW,
                               has_mask=has_mask)
    blk = lambda nn_: pl.BlockSpec((PG, h, nn_, d), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
    dq, dk, dv, dbias_packed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk(n), blk(nk), blk(nk),
                  pl.BlockSpec((h, P * n, P * nk), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  mask_spec, blk(n)],
        out_specs=(blk(n), blk(nk), blk(nk),
                   pl.BlockSpec((h, P * n, P * nk), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((w, h, n, d), q.dtype),
                   jax.ShapeDtypeStruct((w, h, nk, d), k.dtype),
                   jax.ShapeDtypeStruct((w, h, nk, d), v.dtype),
                   jax.ShapeDtypeStruct((h, P * n, P * nk), jnp.float32)),
        interpret=interpret,
    )(q, k, v, bias_packed, mask_arr, g)

    # un-pack dbias: sum the P diagonal blocks back to [h, n, nk]
    dbias = sum(dbias_packed[:, p * n:(p + 1) * n, p * nk:(p + 1) * nk]
                for p in range(P))
    return dq, dk, dv, dbias


def _xla_reference(q, k, v, bias, mask, scale, nW):
    """Plain-XLA window attention (for the custom-vjp backward and tests)."""
    w, h, n, d = q.shape
    logits = jnp.einsum("whnd,whmd->whnm", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    logits = logits + bias.astype(jnp.float32)[None]
    if mask is not None:
        m = jnp.tile(mask.astype(jnp.float32), (w // nW, 1, 1))
        logits = logits + m[:, None]
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("whnm,whmd->whnd", probs.astype(q.dtype), v)
    return out, probs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_window_attention(q, k, v, bias, mask, scale: float, nW: int,
                           interpret: bool = False):
    """``softmax(q k^T * scale + bias [+ mask]) v`` fused in VMEM.

    Args:
      q: ``[W, h, n, d]``; k, v: ``[W, h, n_kv, d]``.
      bias: ``[h, n, n_kv]`` additive, broadcast over windows.
      mask: ``[nW, n, n_kv]`` additive, cycling every nW windows, or None.
      scale: q scaling (``d_head**-0.5``).
      nW: windows per image (mask period). Unused when mask is None.
    Returns ``[W, h, n, d]`` in q's dtype.
    """
    if mask is not None and q.shape[0] % nW != 0:
        out, _ = _xla_reference(q, k, v, bias, mask, scale, nW)
        return out
    impl = functools.partial(_forward, scale=scale, nW=nW,
                             interpret=interpret)
    # quantum=nW under a mask: the window-major leading dim must shard at
    # image boundaries for the mask's cycling index map to stay aligned
    return _spmd_call(impl,
                      [(q, 0), (k, 0), (v, 0), (bias, None), (mask, None)],
                      quantum=nW if mask is not None else 1)


def _fwd(q, k, v, bias, mask, scale, nW, interpret):
    out = fused_window_attention(q, k, v, bias, mask, scale, nW, interpret)
    return out, (q, k, v, bias, mask)


def _xla_backward(q, k, v, bias, mask, g, scale, nW):
    """Plain-XLA backward (shapes the packer cannot tile)."""
    _, probs = _xla_reference(q, k, v, bias, mask, scale, nW)
    g32 = g.astype(jnp.float32)
    p32 = probs
    v32 = v.astype(jnp.float32)
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)

    dv = jnp.einsum("whnm,whnd->whmd", p32, g32)
    dprobs = jnp.einsum("whnd,whmd->whnm", g32, v32)
    dlogits = p32 * (dprobs - jnp.sum(dprobs * p32, axis=-1, keepdims=True))
    dq = jnp.einsum("whnm,whmd->whnd", dlogits, k32) * scale
    dk = jnp.einsum("whnm,whnd->whmd", dlogits, q32) * scale
    dbias = jnp.sum(dlogits, axis=0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias)


def _backward_any(q, k, v, bias, mask, g, scale, nW, interpret):
    """Fused backward, or the XLA fallback where the packer can't tile —
    decided from the shapes ACTUALLY seen, so the batch-partitioned
    per-shard lowering re-decides at local shapes."""
    if mask is None or q.shape[0] % nW == 0:
        fused = _backward(q, k, v, bias, mask, g, scale, nW, interpret)
        if fused is not None:
            return fused
    return _xla_backward(q, k, v, bias, mask, g, scale, nW)


def _bwd(scale, nW, interpret, res, g):
    q, k, v, bias, mask = res
    impl = functools.partial(_backward_any, scale=scale, nW=nW,
                             interpret=interpret)
    # dbias is accumulated ACROSS the window/batch grid -> psum'd over the
    # batch mesh axes by the partitioned lowering (reduced_out)
    dq, dk, dv, dbias = _spmd_call(
        impl, [(q, 0), (k, 0), (v, 0), (bias, None), (mask, None), (g, 0)],
        out_batch_dims=(0, 0, 0, None), reduced_out=(3,),
        quantum=nW if mask is not None else 1)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (dq, dk, dv, dbias.astype(bias.dtype), dmask)


fused_window_attention.defvjp(_fwd, _bwd)
