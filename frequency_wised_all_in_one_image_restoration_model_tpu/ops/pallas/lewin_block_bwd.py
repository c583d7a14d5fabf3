"""Fused Pallas BACKWARD kernels for the whole-LeWin-block ops.

Why: the fused block kernels' custom VJPs previously recomputed the
UNFUSED XLA composite and differentiated through it, so the training
backward paid the exact fusion-boundary/HBM-round-trip tax the forward
kernels were built to remove (measured on v5e: the encoder-phase step
spent ~85 of 107 ms in backward while two fused forwards cost ~16 ms).
These kernels are the flash-attention-style answer: one pass per block
half that streams a row-tile of (x, g) through VMEM, recomputes the
forward intermediates in-register, and emits dx plus all weight
gradients. Weight grads accumulate across the sequential TPU grid into
VMEM-resident output blocks (constant index maps, initialized at the
first step — the same revisited-block pattern as
``window_attention._bwd_kernel``).

Three kernels cover the four fused forwards:

* :func:`attn_block_bwd` — backward of ``_attn_forward`` (so both
  :func:`~.lewin_block.fused_block_attention` and
  :func:`~.lewin_block.fused_freq_intra`): recompute LN1 -> qkv -> packed
  window attention (+ mask, + all_DC rank-1) in the tile, then
  dproj/dattention/dqkv/dLN in place. Per-band bias gradients accumulate
  into band-indexed output blocks (bands are contiguous in the batch
  grid, so each block is resident exactly while its band runs).
* :func:`ffn_block_bwd` — backward of the LeFF half: the 3x3 depthwise
  conv needs a 2-row x halo and a 1-row g halo (grad wrt a hidden row
  reaches one conv row further than the forward's 1-row halo); both come
  from the same prev/cur/next BlockSpec trick as the forward, with
  wrap-free boundary rows zeroed like the forward's conv padding.
* :func:`freq_inter_bwd` — backward of the window-grouped cross-band
  half (no LN, residual passes g straight through to ``res``).

Stages whose weight mats + fp32 grad accumulators don't fit scoped VMEM
(:func:`attn_bwd_fits` / :func:`ffn_bwd_fits`) keep the previous
XLA-recompute backward — on the flagship that is only the C=896
bottleneck. ``FAIRM_BWD_KERNEL=0`` restores the XLA-recompute backward
everywhere.

Reference semantics: encoder_Uformer.py:515-682 / decoder_Uformer.py:
504-756 (the blocks whose forward these mirror); gradient definitions
are pinned against ``jax.vjp`` of the unfused composites in
tests/test_pallas_lewin_block_bwd.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lewin_block import (_pack_bias_np, _resolve_interpret, _tile_budget,
                          _win_pack, _win_unpack)


def use_bwd_kernel() -> bool:
    """Fused Pallas backward for the block kernels: default on for TPU
    backends, off elsewhere (interpret-mode Pallas backward is orders of
    magnitude slower than the XLA-recompute backward on CPU — it would
    dominate the test suite and the virtual-mesh dryrun).
    FAIRM_BWD_KERNEL=1 forces on (tests pin this for interpret-mode
    grad parity); =0 restores the XLA-recompute backward everywhere."""
    env = os.environ.get("FAIRM_BWD_KERNEL")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


# Number of ~[M, C]-fp32-sized token copies the attention backward holds
# on the kernel stack (xhat, xn, xw, qkv, g, dout, out_all, dqkv x3,
# dxw, dxn, dxhat, dx, ...) — the budget model for the row-tile chooser.
_ATTN_BWD_COPIES = 14


def attn_bwd_fits(C: int, win: int, W: int, itemsize: int) -> bool:
    """Whether the attention backward's T-independent VMEM residents fit:
    qkv+proj weight mats in the compute dtype plus their fp32 grad
    accumulators (4C^2 * (itemsize+4)), with room for one win-row tile of
    token copies. At the flagship's C=896 bottleneck the weights+grads
    alone are 19.2 MB -> XLA fallback there; every other stage fits."""
    resident = 4 * C * C * (itemsize + 4)
    tokens = _ATTN_BWD_COPIES * win * W * C * 4
    return resident + tokens <= (13 << 20)


def _choose_t_bwd(H: int, W: int, win: int, C: int, itemsize: int) -> int:
    budget = _tile_budget(6, "FAIRM_ATTN_BWD_T_MB", itemsize)
    t = win
    while (t * 2 <= H and H % (t * 2) == 0
           and _ATTN_BWD_COPIES * (t * 2) * W * C * 4 <= budget):
        t *= 2
    return t


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


_GELU_C = 0.7978845608028654        # sqrt(2/pi)
_GELU_A = 0.044715


def _gelu_grad(x):
    """d/dx of the tanh-approximate gelu (matches
    ``jax.nn.gelu(approximate=True)`` analytically)."""
    u = _GELU_C * (x + _GELU_A * x * x * x)
    t = jnp.tanh(u)
    du = _GELU_C * (1.0 + 3.0 * _GELU_A * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


# ---------------------------------------------------------------------------
# Attention half (covers fused_block_attention and fused_freq_intra)
# ---------------------------------------------------------------------------


def _attn_bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                     wp_ref, bias_ref, mask_ref, lam_ref,
                     dx_ref, dlns_ref, dlnb_ref, dwqkv_ref, dbqkv_ref,
                     dwp_ref, dbp_ref, dbias_ref, dlam_ref, *,
                     T: int, W: int, C: int, h: int, win: int, P: int,
                     Q: int, eps: float, has_mask: bool, has_lam: bool,
                     res: bool, ipb: int, dtype):
    n = win * win
    nw_tile = (T // win) * (W // win)
    M = nw_tile * n
    G = nw_tile // P
    d = C // h
    scale = d ** -0.5
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init_global():
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    # band-indexed bias-grad block: first step of each band zeroes it
    # (bands are contiguous in b, so the block is resident per band)
    @pl.when(jnp.logical_and((b * Q) % ipb == 0, i == 0))
    def _init_band():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    # ---- recompute forward intermediates (same math as _attn_kernel)
    x = x_ref[...].reshape(Q * T, W, C)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rsig
    xn = xhat * lns_ref[0] + lnb_ref[0]
    xw = _win_pack(xn.astype(dtype), Q * T, W, win, C)      # [QM, C]
    qkv = jax.lax.dot_general(
        xw, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv = qkv.astype(dtype)                                 # [QM, 3C]

    g_arr = g_ref[...].reshape(Q * T, W, C)
    gp = _win_pack(g_arr.astype(jnp.float32), Q * T, W, win, C)
    g_dt = gp.astype(dtype)

    # ---- proj backward: out = residual + out_all @ wp + bp
    dbp_ref[...] += jnp.sum(gp, axis=0, keepdims=True)
    dout = jax.lax.dot_general(                             # g @ wp^T
        g_dt, wp_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [QM, C]

    dlam_acc = jnp.zeros((Q, 1, h), jnp.float32) if has_lam else None
    out_groups = []
    dqkv_groups = []
    for g_ in range(Q * G):
        qi, mg = g_ // G, g_ % G
        s = slice(g_ * P * n, (g_ + 1) * P * n)
        head_outs = []
        dq_heads, dk_heads, dv_heads = [], [], []
        for hh in range(h):
            q = qkv[s, hh * d:(hh + 1) * d]
            k = qkv[s, C + hh * d:C + (hh + 1) * d]
            v = qkv[s, 2 * C + hh * d:2 * C + (hh + 1) * d]
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = logits + bias_ref[0, hh]
            if has_mask:
                logits = logits + mask_ref[0, mg]
            logits = logits - jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits)
            p = e / jnp.sum(e, axis=-1, keepdims=True)      # [Pn, Pn] f32
            og = jax.lax.dot_general(
                p.astype(dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [Pn, d] f32

            do = dout[s, hh * d:(hh + 1) * d]               # [Pn, d] f32
            if has_lam:
                # out' = (1+lam)*og - (lam/n) * sum_m v[m]  (per window)
                lamv = lam_ref[qi, 0, hh]
                og3 = og.reshape(P, n, d)
                do3 = do.reshape(P, n, d)
                v3 = v.astype(jnp.float32).reshape(P, n, d)
                vs = jnp.sum(v3, axis=1)                    # [P, d]
                out_h = ((1.0 + lamv) * og3
                         - (lamv / n) * vs[:, None, :]).reshape(P * n, d)
                c_lam = jnp.sum(do3 * (og3 - vs[:, None, :] / n))
                hot = jnp.logical_and(
                    jax.lax.broadcasted_iota(jnp.int32, (Q, 1, h), 0) == qi,
                    jax.lax.broadcasted_iota(jnp.int32, (Q, 1, h), 2) == hh)
                dlam_acc = dlam_acc + jnp.where(hot, c_lam, 0.0)
                dog = ((1.0 + lamv) * do3).reshape(P * n, d)
                dv_extra = jnp.broadcast_to(
                    jnp.sum(do3, axis=1)[:, None, :] * (-lamv / n),
                    (P, n, d)).reshape(P * n, d)
            else:
                out_h = og
                dog = do
                dv_extra = None

            dog_dt = dog.astype(dtype)
            dp = jax.lax.dot_general(                       # dog @ v^T
                dog_dt, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [Pn, Pn]
            dv = jax.lax.dot_general(                       # p^T @ dog
                p.astype(dtype), dog_dt,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [Pn, d]
            if dv_extra is not None:
                dv = dv + dv_extra
            dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            db = dl[0 * n:1 * n, 0 * n:1 * n]
            for p_ in range(1, P):
                db = db + dl[p_ * n:(p_ + 1) * n, p_ * n:(p_ + 1) * n]
            dbias_ref[0, hh] += db
            dl_dt = dl.astype(dtype)
            dq = jax.lax.dot_general(                       # dl @ k
                dl_dt, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(                       # dl^T @ q
                dl_dt, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            head_outs.append(out_h.astype(dtype))
            dq_heads.append(dq.astype(dtype))
            dk_heads.append(dk.astype(dtype))
            dv_heads.append(dv.astype(dtype))
        out_groups.append(jnp.concatenate(head_outs, axis=1))
        dqkv_groups.append(
            jnp.concatenate(dq_heads + dk_heads + dv_heads, axis=1))
    out_all = jnp.concatenate(out_groups, axis=0)           # [QM, C] dt
    dqkv = jnp.concatenate(dqkv_groups, axis=0)             # [QM, 3C] dt

    dwp_ref[...] += jax.lax.dot_general(                    # out^T @ g
        out_all, g_dt, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwqkv_ref[...] += jax.lax.dot_general(                  # xw^T @ dqkv
        xw, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                              keepdims=True)
    dxw = jax.lax.dot_general(                              # dqkv @ w^T
        dqkv, wqkv_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [QM, C]
    dxn = _win_unpack(dxw, Q * T, W, win, C)                # [QT, W, C]

    # ---- LN backward
    dxhat = dxn * lns_ref[0]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rsig * (dxhat - m1 - xhat * m2)
    dlns_ref[...] += jnp.sum((dxn * xhat).reshape(-1, C), axis=0,
                             keepdims=True)
    dlnb_ref[...] += jnp.sum(dxn.reshape(-1, C), axis=0, keepdims=True)
    if res:
        dx = dx + g_arr.astype(jnp.float32)
    dx_ref[...] = dx.reshape(Q, T, W, C).astype(dx_ref.dtype)

    if has_lam:
        @pl.when(i == 0)
        def _set():
            dlam_ref[...] = dlam_acc

        @pl.when(i > 0)
        def _acc():
            dlam_ref[...] += dlam_acc


def attn_block_bwd(x_img, g, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                   bp, bias, mask, lam, win: int, eps: float, interpret,
                   res: bool = True, bias_groups: int = 1):
    """Fused backward of :func:`~.lewin_block._attn_forward`. Returns
    ``(dx, dlns, dlnb, dwq3, dbq3, dwk3, dbk3, dwv3, dbv3, dwp3, dbp,
    dbias, dlam)`` in the forward's argument layouts (``dlam`` is None
    when ``lam`` is None), or None when the shapes don't tile — the
    caller falls back to the XLA-recompute backward."""
    interpret = _resolve_interpret(interpret)
    B, H, W, C = x_img.shape
    h = wq3.shape[0]
    n = win * win
    d = C // h
    nw_row = W // win
    itemsize = jnp.dtype(x_img.dtype).itemsize
    if (H % win or W % win
            or not attn_bwd_fits(C, win, W, itemsize)):
        return None
    T = _choose_t_bwd(H, W, win, C, itemsize)
    nw_tile = (T // win) * nw_row
    pmax = max(1, (128 * int(os.environ.get("FAIRM_ATTN_P", "2"))) // n)
    while pmax > 1 and h * (pmax * n) ** 2 * 4 > (2 << 20):
        pmax //= 2
    P = max(1, min(pmax, nw_tile))
    while nw_tile % P != 0:
        P -= 1
    G = nw_tile // P
    nI = H // T

    # Q-packing (whole images per grid step at deep low-res stages),
    # mirroring the forward's chooser with the backward's copy count
    M = nw_tile * n
    q_rows = int(os.environ.get("FAIRM_ATTN_Q", "512"))
    q_imgs = B // bias_groups
    Q = 1
    for cand in range(min(B, max(1, q_rows // M)), 1, -1):
        if (q_imgs % cand == 0 and cand * M <= q_rows
                and _ATTN_BWD_COPIES * cand * T * W * C * 4 <= (8 << 20)):
            Q = cand
            break

    has_mask = mask is not None
    has_lam = lam is not None

    dt = x_img.dtype
    wqkv_full = jnp.concatenate(
        [w.transpose(1, 0, 2).reshape(C, C) for w in (wq3, wk3, wv3)],
        axis=1).astype(dt)
    bqkv_full = jnp.concatenate(
        [bb.reshape(C) for bb in (bq3, bk3, bv3)]
    ).reshape(1, 3 * C).astype(jnp.float32)
    wp_full = wp3.reshape(C, C).astype(dt)

    bias_nb = bias if bias_groups > 1 else bias[None]
    bias_p = (jnp.tile(bias_nb.astype(jnp.float32), (1, 1, P, P))
              + jnp.asarray(_pack_bias_np(P, n))[None, None])
    imgs_per_band = B // bias_groups
    if bias_groups > 1:
        bias_spec = pl.BlockSpec(
            (1, h, P * n, P * n),
            lambda b, i: ((b * Q) // imgs_per_band, 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        bias_spec = pl.BlockSpec((1, h, P * n, P * n),
                                 lambda b, i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    dbias_spec = bias_spec if bias_groups > 1 else pl.BlockSpec(
        (1, h, n, n), lambda b, i: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    if bias_groups > 1:
        dbias_spec = pl.BlockSpec(
            (1, h, n, n),
            lambda b, i: ((b * Q) // imgs_per_band, 0, 0, 0),
            memory_space=pltpu.VMEM)

    if has_mask:
        nW = mask.shape[0]
        if nW != (H // win) * nw_row:
            return None
        m = mask.astype(jnp.float32).reshape(nI, G, P, n, n)
        mp = jnp.zeros((nI, G, P * n, P * n), jnp.float32)
        for p_ in range(P):
            mp = mp.at[:, :, p_ * n:(p_ + 1) * n,
                       p_ * n:(p_ + 1) * n].set(m[:, :, p_])
        mask_arr = mp
        mask_spec = pl.BlockSpec((1, G, P * n, P * n),
                                 lambda b, i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_arr = jnp.zeros((1, 1, P * n, P * n), jnp.float32)
        mask_spec = pl.BlockSpec((1, 1, P * n, P * n),
                                 lambda b, i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    if has_lam:
        lam_arr = lam.astype(jnp.float32).reshape(B, 1, h)
        lam_spec = pl.BlockSpec((Q, 1, h), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        lam_arr = jnp.zeros((1, 1, h), jnp.float32)
        lam_spec = pl.BlockSpec((1, 1, h), lambda b, i: (0, 0, 0),
                                memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _attn_bwd_kernel, T=T, W=W, C=C, h=h, win=win, P=P, Q=Q, eps=eps,
        has_mask=has_mask, has_lam=has_lam, res=res, ipb=imgs_per_band,
        dtype=dt)
    vspec = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((Q, T, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(B // Q, nI),
        in_specs=[
            xspec, xspec,
            vspec(1, C), vspec(1, C),
            vspec(C, 3 * C), vspec(1, 3 * C),
            vspec(C, C),
            bias_spec, mask_spec, lam_spec,
        ],
        out_specs=(
            xspec,
            vspec(1, C), vspec(1, C),
            vspec(C, 3 * C), vspec(1, 3 * C),
            vspec(C, C), vspec(1, C),
            dbias_spec,
            pl.BlockSpec((Q, 1, h), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), x_img.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((bias_groups, h, n, n), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, h), jnp.float32),
        ),
        interpret=interpret,
    )(x_img, g, lns.reshape(1, C), lnb.reshape(1, C), wqkv_full,
      bqkv_full, wp_full, bias_p, mask_arr, lam_arr)
    (dx, dlns, dlnb, dwqkv, dbqkv, dwp, dbp, dbias_nb, dlam_b) = outs

    # back to the forward's argument layouts
    to3 = lambda w: w.reshape(C, h, d).transpose(1, 0, 2)
    dwq3 = to3(dwqkv[:, :C])
    dwk3 = to3(dwqkv[:, C:2 * C])
    dwv3 = to3(dwqkv[:, 2 * C:])
    dbq3 = dbqkv[0, :C].reshape(h, d)
    dbk3 = dbqkv[0, C:2 * C].reshape(h, d)
    dbv3 = dbqkv[0, 2 * C:].reshape(h, d)
    dwp3 = dwp.reshape(h, d, C)
    dbias = dbias_nb if bias_groups > 1 else dbias_nb[0]
    dlam = dlam_b.reshape(B, h) if has_lam else None
    return (dx, dlns.reshape(C), dlnb.reshape(C), dwq3, dbq3, dwk3, dbk3,
            dwv3, dbv3, dwp3, dbp.reshape(C), dbias, dlam)


# ---------------------------------------------------------------------------
# FFN half (LeFF)
# ---------------------------------------------------------------------------


def ffn_bwd_fits(C: int, Hd: int, W: int, itemsize: int) -> bool:
    """Weight mats in the compute dtype + fp32 grad accumulators + the
    minimum (T=2) hidden-row working set must fit scoped VMEM. On the
    flagship only the C=896/Hd=3584 bottleneck fails -> XLA fallback."""
    resident = 2 * C * Hd * (itemsize + 4)
    hidden_min = (8 * 2 + 16) * (W + 2) * Hd * 4
    return resident + hidden_min <= (14 << 20)


def _ffn_bwd_choose_t(H: int, W: int, Hd: int, itemsize: int) -> int:
    budget = _tile_budget(8, "FAIRM_FFN_BWD_T_MB", itemsize)
    t = H
    while t > 2 and (8 * t + 16) * (W + 2) * Hd * 4 > budget:
        for dd in range(t // 2, 1, -1):
            if H % dd == 0:
                t = dd
                break
        else:
            t = 2
    return t


def _ffn_bwd_kernel(xp_ref, xc_ref, xn_ref, gp_ref, gc_ref, gn_ref,
                    lns_ref, lnb_ref, w1_ref, b1_ref, wd_ref, bd_ref,
                    w2_ref,
                    dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref,
                    dwd_ref, dbd_ref, dw2_ref, db2_ref, *,
                    T: int, W: int, C: int, Hd: int, eps: float, dtype):
    b = pl.program_id(0)
    i = pl.program_id(1)
    last = pl.num_programs(1) - 1

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init():
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dwd_ref[...] = jnp.zeros_like(dwd_ref)
        dbd_ref[...] = jnp.zeros_like(dbd_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    # ---- recompute forward on T+4 rows (2-row x halo)
    x = jnp.concatenate(
        [xp_ref[0, T - 2:T], xc_ref[0], xn_ref[0, 0:2]], axis=0)
    xf = x.astype(jnp.float32)                              # [T+4, W, C]
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rsig
    xn = (xhat * lns_ref[0] + lnb_ref[0]).astype(dtype)

    h1 = jax.lax.dot_general(
        xn.reshape((T + 4) * W, C), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...]
    h1 = h1.reshape(T + 4, W, Hd)
    a1 = _gelu(h1)

    # zero hidden rows outside the image (conv zero padding), rows are
    # global t-2+j for j in [0, T+4)
    rows4 = jax.lax.broadcasted_iota(jnp.int32, (T + 4, 1, 1), 0)
    out_top = jnp.logical_and(i == 0, rows4 < 2)
    out_bot = jnp.logical_and(i == last, rows4 >= T + 2)
    a1 = jnp.where(jnp.logical_or(out_top, out_bot), 0.0, a1)

    zcol = jnp.zeros((T + 4, 1, Hd), jnp.float32)
    a1p = jnp.concatenate([zcol, a1, zcol], axis=1)         # [T+4, W+2]

    # hc (pre-gelu conv out) on T+2 rows: global [t-1, t+T+1)
    hc = jnp.zeros((T + 2, W, Hd), jnp.float32)
    for dy in range(3):
        for dx_ in range(3):
            tap = wd_ref[dy, dx_][None, None, :]
            hc = hc + a1p[dy:dy + T + 2, dx_:dx_ + W] * tap
    hc = hc + bd_ref[...]
    a2 = _gelu(hc)

    # ---- backward
    g1 = jnp.concatenate(
        [gp_ref[0, T - 1:T], gc_ref[0], gn_ref[0, 0:1]], axis=0)
    g1f = g1.astype(jnp.float32)                            # [T+2, W, C]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (T + 2, 1, 1), 0)
    g_top = jnp.logical_and(i == 0, rows2 < 1)
    g_bot = jnp.logical_and(i == last, rows2 >= T + 1)
    g1f = jnp.where(jnp.logical_or(g_top, g_bot), 0.0, g1f)
    gc = g1f[1:T + 1]                                       # center rows

    da2 = jax.lax.dot_general(                              # g @ w2^T
        g1f.astype(dtype).reshape((T + 2) * W, C), w2_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(T + 2, W, Hd)
    dhc = da2 * _gelu_grad(hc)                              # [T+2, W, Hd]

    dbd_ref[...] += jnp.sum(dhc[1:T + 1].reshape(-1, Hd), axis=0)
    dw2_ref[...] += jax.lax.dot_general(                    # a2c^T @ gc
        a2[1:T + 1].reshape(T * W, Hd).astype(dtype),
        gc.reshape(T * W, C).astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(gc.reshape(-1, C), axis=0, keepdims=True)

    dhc_c = dhc[1:T + 1]                                    # [T, W, Hd]
    for dy in range(3):
        for dx_ in range(3):
            dwd_ref[dy, dx_] += jnp.sum(
                (a1p[1 + dy:1 + dy + T, dx_:dx_ + W] * dhc_c
                 ).reshape(-1, Hd), axis=0)

    dhcp = jnp.concatenate(
        [jnp.zeros((T + 2, 1, Hd), jnp.float32), dhc,
         jnp.zeros((T + 2, 1, Hd), jnp.float32)], axis=1)   # [T+2, W+2]
    da1 = jnp.zeros((T, W, Hd), jnp.float32)
    for dy in range(3):
        for dx_ in range(3):
            tap = wd_ref[dy, dx_][None, None, :]
            da1 = da1 + dhcp[2 - dy:2 - dy + T, 2 - dx_:2 - dx_ + W] * tap

    dh1 = da1 * _gelu_grad(h1[2:T + 2])                     # [T, W, Hd]
    dh1_flat = dh1.reshape(T * W, Hd)
    dw1_ref[...] += jax.lax.dot_general(                    # xn_c^T @ dh1
        xn[2:T + 2].reshape(T * W, C),
        dh1_flat.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh1_flat, axis=0, keepdims=True)

    dxn = jax.lax.dot_general(                              # dh1 @ w1^T
        dh1_flat.astype(dtype), w1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(T, W, C)

    xhat_c = xhat[2:T + 2]
    dxhat = dxn * lns_ref[0]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat_c, axis=-1, keepdims=True)
    dx = rsig[2:T + 2] * (dxhat - m1 - xhat_c * m2) + gc
    dlns_ref[...] += jnp.sum((dxn * xhat_c).reshape(-1, C), axis=0,
                             keepdims=True)
    dlnb_ref[...] += jnp.sum(dxn.reshape(-1, C), axis=0, keepdims=True)
    dx_ref[...] = dx.reshape(1, T, W, C).astype(dx_ref.dtype)


def ffn_block_bwd(x_img, g, lns, lnb, w1, b1, wd, bd, w2, b2, eps: float,
                  interpret):
    """Fused backward of :func:`~.lewin_block.fused_block_ffn`. Returns
    ``(dx, dlns, dlnb, dw1, db1, dwd, dbd, dw2, db2)`` or None when the
    shapes don't fit (caller falls back to the XLA-recompute backward)."""
    interpret = _resolve_interpret(interpret)
    B, H, W, C = x_img.shape
    Hd = w1.shape[1]
    itemsize = jnp.dtype(x_img.dtype).itemsize
    if not ffn_bwd_fits(C, Hd, W, itemsize):
        return None
    T = _ffn_bwd_choose_t(H, W, Hd, itemsize)
    if T < 2 or H % T:
        return None
    nI = H // T
    dt = x_img.dtype
    w1c = w1.astype(dt)
    w2c = w2.astype(dt)
    b1f = b1.astype(jnp.float32).reshape(1, Hd)
    wdf = wd.astype(jnp.float32)
    bdf = bd.astype(jnp.float32)

    kernel = functools.partial(_ffn_bwd_kernel, T=T, W=W, C=C, Hd=Hd,
                               eps=eps, dtype=dt)
    vspec = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    xspec = lambda imap: pl.BlockSpec((1, T, W, C), imap,
                                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(B, nI),
        in_specs=[
            xspec(lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0)),
            xspec(lambda b, i: (b, i, 0, 0)),
            xspec(lambda b, i: (b, jnp.minimum(i + 1, nI - 1), 0, 0)),
            xspec(lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0)),
            xspec(lambda b, i: (b, i, 0, 0)),
            xspec(lambda b, i: (b, jnp.minimum(i + 1, nI - 1), 0, 0)),
            vspec(1, C), vspec(1, C),
            vspec(C, Hd), vspec(1, Hd), vspec(3, 3, Hd), vspec(Hd),
            vspec(Hd, C),
        ],
        out_specs=(
            pl.BlockSpec((1, T, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec(1, C), vspec(1, C),
            vspec(C, Hd), vspec(1, Hd),
            vspec(3, 3, Hd), vspec(Hd),
            vspec(Hd, C), vspec(1, C),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), x_img.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, Hd), jnp.float32),
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, Hd), jnp.float32),
            jax.ShapeDtypeStruct((Hd,), jnp.float32),
            jax.ShapeDtypeStruct((Hd, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        interpret=interpret,
    )(x_img, x_img, x_img, g, g, g, lns.reshape(1, C), lnb.reshape(1, C),
      w1c, b1f, wdf, bdf, w2c)
    (dx, dlns, dlnb, dw1, db1, dwd, dbd, dw2, db2) = outs
    return (dx, dlns.reshape(C), dlnb.reshape(C), dw1, db1.reshape(Hd),
            dwd, dbd, dw2, db2.reshape(C))


# ---------------------------------------------------------------------------
# Frequency-MSA inter half (window-grouped cross-band attention)
# ---------------------------------------------------------------------------


def _freq_inter_bwd_kernel(y_ref, g_ref, wqkv_ref, bqkv_ref, wp_ref,
                           bias_ref, mask_ref,
                           dy_ref, dwqkv_ref, dbqkv_ref, dwp_ref,
                           dbp_ref, dbias_ref, *, L: int, T: int, W: int,
                           C: int, h: int, win: int, has_mask: bool,
                           dtype):
    n = win * win
    nw = (T // win) * (W // win)
    Ln = L * n
    d = C // h
    scale = d ** -0.5
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    # recompute grouped tokens + qkv (same as _freq_inter_kernel)
    y = y_ref[:, 0]                                         # [L, T, W, C]
    z = jnp.stack([_win_pack(y[l].astype(dtype), T, W, win, C)
                   for l in range(L)], axis=0)
    z = (z.reshape(L, nw, n, C).transpose(1, 0, 2, 3)
          .reshape(nw * Ln, C))
    qkv = jax.lax.dot_general(
        z, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv = qkv.astype(dtype)

    garr = g_ref[:, 0]                                      # [L, T, W, C]
    gp = jnp.stack([_win_pack(garr[l].astype(jnp.float32), T, W, win, C)
                    for l in range(L)], axis=0)
    gp = (gp.reshape(L, nw, n, C).transpose(1, 0, 2, 3)
            .reshape(nw * Ln, C))                           # grouped f32
    g_dt = gp.astype(dtype)

    dbp_ref[...] += jnp.sum(gp, axis=0, keepdims=True)
    dout = jax.lax.dot_general(
        g_dt, wp_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [nw*Ln, C]

    out_wins = []
    dqkv_wins = []
    for j in range(nw):
        s = slice(j * Ln, (j + 1) * Ln)
        mtile = (jnp.tile(mask_ref[0, j], (L, L)) if has_mask else None)
        head_outs = []
        dq_heads, dk_heads, dv_heads = [], [], []
        for hh in range(h):
            q = qkv[s, hh * d:(hh + 1) * d]
            k = qkv[s, C + hh * d:C + (hh + 1) * d]
            v = qkv[s, 2 * C + hh * d:2 * C + (hh + 1) * d]
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = logits + bias_ref[hh]
            if has_mask:
                logits = logits + mtile
            logits = logits - jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            og = jax.lax.dot_general(
                p.astype(dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            do = dout[s, hh * d:(hh + 1) * d]
            do_dt = do.astype(dtype)
            dp = jax.lax.dot_general(
                do_dt, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv = jax.lax.dot_general(
                p.astype(dtype), do_dt,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dbias_ref[hh] += dl
            dl_dt = dl.astype(dtype)
            dq = jax.lax.dot_general(
                dl_dt, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                dl_dt, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            head_outs.append(og.astype(dtype))
            dq_heads.append(dq.astype(dtype))
            dk_heads.append(dk.astype(dtype))
            dv_heads.append(dv.astype(dtype))
        out_wins.append(jnp.concatenate(head_outs, axis=1))
        dqkv_wins.append(
            jnp.concatenate(dq_heads + dk_heads + dv_heads, axis=1))
    out_all = jnp.concatenate(out_wins, axis=0)             # [nw*Ln, C]
    dqkv = jnp.concatenate(dqkv_wins, axis=0)

    dwp_ref[...] += jax.lax.dot_general(
        out_all, g_dt, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwqkv_ref[...] += jax.lax.dot_general(
        z, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                              keepdims=True)
    dz = jax.lax.dot_general(
        dqkv, wqkv_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [nw*Ln, C]

    dzb = (dz.reshape(nw, L, n, C).transpose(1, 0, 2, 3)
             .reshape(L, nw * n, C))
    for l in range(L):
        dy_ref[l, 0] = _win_unpack(dzb[l], T, W, win, C).astype(
            dy_ref.dtype)


def freq_inter_bwd(y_img, g, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp,
                   biasB, mask, L: int, win: int, interpret):
    """Fused backward of :func:`~.lewin_block.fused_freq_inter` (without
    the residual passthrough — ``dres = g`` is handled by the caller).
    Returns ``(dy, dwq3, dbq3, dwk3, dbk3, dwv3, dbv3, dwp3, dbp,
    dbiasB)`` or None on shapes that don't tile."""
    interpret = _resolve_interpret(interpret)
    LB, H, W, C = y_img.shape
    B = LB // L
    h = wq3.shape[0]
    n = win * win
    d = C // h
    nw_row = W // win
    itemsize = jnp.dtype(y_img.dtype).itemsize
    if H % win or W % win:
        return None
    if 4 * C * C * (itemsize + 4) > (12 << 20):
        return None

    inter_budget = _tile_budget(5, "FAIRM_INTER_BWD_T_MB", itemsize)
    T = win
    while (T * 2 <= H and H % (T * 2) == 0
           and ((T * 2) // win) * nw_row * 4 * (L * n) ** 2 * 4
           <= inter_budget):
        T *= 2
    nI = H // T
    nw = (T // win) * nw_row

    y5 = y_img.reshape(L, B, H, W, C)
    g5 = g.reshape(L, B, H, W, C)
    has_mask = mask is not None
    if has_mask:
        if mask.shape[0] != (H // win) * nw_row:
            return None
        m = mask.astype(jnp.float32).reshape(nI, nw, n, n)
        mask_spec = pl.BlockSpec((1, nw, n, n), lambda b, i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        m = jnp.zeros((1, 1, n, n), jnp.float32)
        mask_spec = pl.BlockSpec((1, 1, n, n), lambda b, i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    dt = y_img.dtype
    wqkv = jnp.concatenate(
        [w.transpose(1, 0, 2).reshape(C, C) for w in (wq3, wk3, wv3)],
        axis=1).astype(dt)
    bqkv = jnp.concatenate(
        [bb.reshape(C) for bb in (bq3, bk3, bv3)]
    ).reshape(1, 3 * C).astype(jnp.float32)
    wp = wp3.reshape(C, C).astype(dt)

    kernel = functools.partial(
        _freq_inter_bwd_kernel, L=L, T=T, W=W, C=C, h=h, win=win,
        has_mask=has_mask, dtype=dt)
    vspec = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((L, 1, T, W, C), lambda b, i: (0, b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(B, nI),
        in_specs=[
            xspec, xspec,
            vspec(C, 3 * C), vspec(1, 3 * C),
            vspec(C, C),
            vspec(h, L * n, L * n),
            mask_spec,
        ],
        out_specs=(
            xspec,
            vspec(C, 3 * C), vspec(1, 3 * C),
            vspec(C, C), vspec(1, C),
            vspec(h, L * n, L * n),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, B, H, W, C), y_img.dtype),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((h, L * n, L * n), jnp.float32),
        ),
        interpret=interpret,
    )(y5, g5, wqkv, bqkv, wp, biasB.astype(jnp.float32), m)
    (dy5, dwqkv, dbqkv, dwp, dbp, dbias) = outs

    to3 = lambda w: w.reshape(C, h, d).transpose(1, 0, 2)
    return (dy5.reshape(LB, H, W, C),
            to3(dwqkv[:, :C]), dbqkv[0, :C].reshape(h, d),
            to3(dwqkv[:, C:2 * C]), dbqkv[0, C:2 * C].reshape(h, d),
            to3(dwqkv[:, 2 * C:]), dbqkv[0, 2 * C:].reshape(h, d),
            dwp.reshape(h, d, C), dbp.reshape(C), dbias)
