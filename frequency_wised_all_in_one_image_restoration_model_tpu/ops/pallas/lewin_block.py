"""Whole-LeWin-block Pallas kernels: the two fused halves of a (S)W-MSA +
LeFF transformer block (reference encoder_Uformer.py:515-682 /
decoder_Uformer.py:504-756).

Motivation (measured on v5e, VALIDATION.md r2): with the window-attention
kernel alone, ~64% of the flagship eval forward sits OUTSIDE attention —
in the LN/qkv/window-pack/proj/residual/LeFF chain whose ops each
round-trip HBM and whose pallas-call boundaries break XLA's elementwise
fusion. These kernels stream a row-tile of the image through VMEM once
per block half:

* :func:`fused_block_attention` — LN1 -> q/kv linear -> window partition
  -> packed multi-head window attention (relative-position bias + SW-MSA
  shift mask + the all_DC rank-1 modulation) -> output proj -> residual.
  One HBM read of x, one write of x + attn(LN(x)).
* :func:`fused_block_ffn` — LN2 -> LeFF (linear C->hid, gelu, 3x3
  depthwise conv, gelu, linear hid->C) -> residual, with the conv's 1-row
  halo via three pipelined BlockSpecs. It subsumes the earlier standalone
  fused-LeFF kernel (deleted) — LN+residual now live INSIDE, fixing the
  fusion-boundary loss that made that kernel a net ~8% e2e regression.

Window packing (P windows per 128-row MXU tile, cross-window logits
killed by -1e9) matches ops/pallas/window_attention.py. Per-head weight
slices arrive pre-reshaped to ``[h, C, d]`` so head selection is a
leading-dim index, never a lane slice. The SW-MSA cyclic shift happens
OUTSIDE (jnp.roll on the image): LN, attention and the residual all
commute with the spatial permutation, so the kernel consumes the rolled
image and the caller rolls the sum back.

Both entries carry custom VJPs whose backward recomputes the unfused XLA
composite (correct gradients; forward-dominated eval plus residual-free
HBM in training recompute), so the fused blocks are usable in training.
By default the recompute's attention core is routed through
:func:`ops.pallas.window_attention.fused_window_attention` — whose forward
AND backward are fused Pallas kernels — instead of the einsum lowering
that materializes ``[W, h, n, n]`` logits in HBM at ~1% MXU
(``FAIRM_FUSED_BWD=0`` restores the pure-XLA backward; the LN/qkv/proj
matmul gradients stay XLA either way, they are already MXU-shaped).
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .partition import spmd_call as _spmd_call


def _use_fused_bwd() -> bool:
    """Route the custom-VJP backward recompute's attention core through the
    fused window-attention kernel (ops/pallas/window_attention.py, which has
    a fused Pallas backward) instead of the einsum lowering that
    materializes [W, h, n, n] logits in HBM at ~1% MXU (VALIDATION.md r2).
    On by default; FAIRM_FUSED_BWD=0 restores the pure-XLA backward."""
    return (os.environ.get("FAIRM_FUSED_BWD", "1")
            not in ("0", "false", "False"))


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _softmax_shift(logits):
    """Stabilize softmax before exp. Default (r4): a STATIC shift
    exp(l - 16) — mathematically identical to max-subtraction after the
    normalizer divide (any constant cancels exactly), and it fuses into
    the exp's elementwise chain instead of costing a full reduction pass
    over the kernel's largest VPU surface ([P*n, P*n]). Measured on v5e:
    full eval forward 131.6 -> 119.4 ms at B=32 (+10% e2e; encoder +16%
    — its freq-MSA logit surfaces are the biggest). fp32-safe for
    logits <= ~104 (e^88 overflows): LN'd tokens keep window logits one
    to two orders below that; the masked positions (-1e9 pack bias,
    -100 band mask) underflow to exactly 0 as with max-sub.
    FAIRM_STATIC_SHIFT=off restores the per-row max subtraction;
    =<K> overrides the shift."""
    k = os.environ.get("FAIRM_STATIC_SHIFT", "16")
    if k not in ("", "0", "off"):
        return logits - float(k)
    return logits - jnp.max(logits, axis=-1, keepdims=True)


def _bf16_logits() -> bool:
    """Store the attention logits tile in bf16. NEGATIVE RESULT, default
    OFF (v5e, r4): halving the bytes of the largest VPU surface
    ([P*n, P*n] for the bias add/max/exp chain) measured a 26% DECODER
    LOSS e2e (6.60 -> 4.92 MP/s at B=32) — Mosaic must round-trip the
    fp32 matmul accumulator through an explicit cast (it rejects bf16
    accumulators outright: 'Expected matmul acc to be 32-bit'), and the
    extra relayout/convert passes cost more than the narrower compute
    saves. Kept as a flag (FAIRM_BF16_LOGITS=1) for future hardware."""
    return (os.environ.get("FAIRM_BF16_LOGITS", "0")
            not in ("0", "false", "False"))


def _win_pack(x, T, W, win, C):
    """[T, W, C] row-tile -> [nw*win*win, C] window-major tokens."""
    nw = W // win
    return (x.reshape(T // win, win, nw, win, C)
             .transpose(0, 2, 1, 3, 4)
             .reshape(-1, C))


def _win_unpack(y, T, W, win, C):
    nw = W // win
    return (y.reshape(T // win, nw, win, win, C)
             .transpose(0, 2, 1, 3, 4)
             .reshape(T, W, C))


def _attn_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wp_ref,
                 bp_ref, bias_ref, mask_ref, lam_ref, dps_ref, out_ref, *,
                 T: int, W: int, C: int, h: int, win: int, P: int, Q: int,
                 eps: float, has_mask: bool, has_lam: bool, has_dps: bool,
                 ln: bool, res: bool, dtype, ldt=jnp.float32):
    n = win * win
    nw_tile = (T // win) * (W // win)
    M = nw_tile * n
    G = nw_tile // P
    d = C // h

    x = x_ref[...].reshape(Q * T, W, C)              # [Q*T, W, C]
    xf = x.astype(jnp.float32)
    if ln:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * lns_ref[0] + lnb_ref[0]
    else:
        xn = xf

    # window-major tokens, images stacked: [Q*M, C]. Row blocks of T are
    # whole images (T % win == 0), so windows never span images.
    xw = _win_pack(xn.astype(dtype), Q * T, W, win, C)

    # ONE full-width qkv matmul [Q*M, C] @ [C, 3C] — per-head matmuls
    # (N = d = 56 lanes) waste >half the MXU; head q/k/v are lane slices
    qkv = jax.lax.dot_general(
        xw, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv = qkv.astype(dtype)                          # [Q*M, 3C]

    group_outs = []
    for g in range(Q * G):
        qi, mg = g // G, g % G                       # image, mask group
        s = slice(g * P * n, (g + 1) * P * n)
        head_outs = []
        for hh in range(h):
            q = qkv[s, hh * d:(hh + 1) * d]
            k = qkv[s, C + hh * d:C + (hh + 1) * d]
            v = qkv[s, 2 * C + hh * d:2 * C + (hh + 1) * d]
            # the q scale is folded into the qkv weights at trace time
            # (zero kernel cost); logits may be stored in bf16 (ldt) with
            # the softmax normalizer still accumulated in fp32
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(ldt)
            logits = logits + bias_ref[0, hh]
            if has_mask:
                logits = logits + mask_ref[0, mg]
            e = jnp.exp(_softmax_shift(logits))
            # normalize AFTER e@v: (e@v)/Z == (e/Z)@v exactly, but the
            # divide touches [P*n, d] instead of [P*n, P*n] — the packed
            # logits area is the kernel's largest VPU surface
            og = jax.lax.dot_general(
                e.astype(dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ) / jnp.sum(e, axis=-1, keepdims=True,
                        dtype=jnp.float32)           # [P*n, d] fp32
            if has_lam:
                # all_DC rank-1 modulation (models/uformer_blocks.py:293):
                # out' = (1+lam)*out - (lam/n) * sum_m v[m]
                lam = lam_ref[qi, 0, hh]             # per-image scalar
                vs = jnp.sum(v.astype(jnp.float32).reshape(P, n, d),
                             axis=1)                 # [P, d]
                og = ((1.0 + lam) * og.reshape(P, n, d)
                      - (lam / n) * vs[:, None, :]).reshape(P * n, d)
            head_outs.append(og.astype(dtype))
        group_outs.append(jnp.concatenate(head_outs, axis=1))  # [P*n, C]
    out_all = jnp.concatenate(group_outs, axis=0)    # [Q*M, C]

    # ONE full-width output projection [Q*M, C] @ [C, C]
    br = jax.lax.dot_general(
        out_all, wp_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bp_ref[0]
    if has_dps:
        # in-kernel DropPath: x(residual) + s_q * branch, s per image
        br = (br.reshape(Q, M, C)
              * dps_ref[...].reshape(Q, 1, 1)).reshape(Q * M, C)
    # residual added in IMAGE layout on the already-resident x tile —
    # saves a packed fp32 [Q*M, C] copy vs accumulating into packed(xf)
    # (elementwise in fp32 either way, bit-identical)
    y = _win_unpack(br, Q * T, W, win, C)
    if res:
        y = y + xf
    out_ref[...] = y.reshape(Q, T, W, C).astype(out_ref.dtype)


def _pack_bias_np(P: int, n: int) -> np.ndarray:
    row_win = np.arange(P * n)[:, None] // n
    col_win = np.arange(P * n)[None, :] // n
    return np.where(row_win == col_win, 0.0, -1e9).astype(np.float32)


def _attn_kernel_split(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                       wp_ref, bp_ref, bias_ref, mask_ref, lam_ref,
                       dps_ref, out_ref, qkv_s, *, T: int, W: int, C: int,
                       h: int, win: int, P: int, eps: float,
                       has_mask: bool, has_lam: bool, has_dps: bool,
                       ln: bool, res: bool, dtype, ldt=jnp.float32):
    """q/k/v-split variant of :func:`_attn_kernel`: grid (B, nI, 3).
    At fp32 C=896 the full [C, 3C] qkv + [C, C] proj weights are 12.8 MB
    and cannot stay resident next to the token copies (measured over
    scoped VMEM on v5e); here substep k brings in ONE [C, C] block (the
    q, k or v projection) and fills its third of the qkv scratch; the
    attention group loop runs at the last substep. Q-packing is disabled
    (Q=1) — this path exists for the deep low-res fp32 stages only."""
    kq = pl.program_id(2)
    n = win * win
    nw_tile = (T // win) * (W // win)
    G = nw_tile // P
    d = C // h

    x = x_ref[0]                                     # [T, W, C]
    xf = x.astype(jnp.float32)
    if ln:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * lns_ref[0] + lnb_ref[0]
    else:
        xn = xf
    xw = _win_pack(xn.astype(dtype), T, W, win, C)   # [M, C]

    part = jax.lax.dot_general(
        xw, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[0]
    # fill this substep's third of the scratch: kq is traced, so select
    # the store slice with @pl.when (static slices, no dynamic indexing)
    for kk in range(3):
        @pl.when(kq == kk)
        def _store(kk=kk):
            qkv_s[:, kk * C:(kk + 1) * C] = part.astype(dtype)

    @pl.when(kq == 2)
    def _attend():
        qkv = qkv_s[...]
        group_outs = []
        for g in range(G):
            sl = slice(g * P * n, (g + 1) * P * n)
            head_outs = []
            for hh in range(h):
                q = qkv[sl, hh * d:(hh + 1) * d]
                k = qkv[sl, C + hh * d:C + (hh + 1) * d]
                v = qkv[sl, 2 * C + hh * d:2 * C + (hh + 1) * d]
                logits = jax.lax.dot_general(
                    q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(ldt)
                logits = logits + bias_ref[0, hh]
                if has_mask:
                    logits = logits + mask_ref[0, g]
                e = jnp.exp(_softmax_shift(logits))
                og = jax.lax.dot_general(
                    e.astype(dtype), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32
                ) / jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
                if has_lam:
                    lam = lam_ref[0, 0, hh]
                    vs = jnp.sum(v.astype(jnp.float32).reshape(P, n, d),
                                 axis=1)
                    og = ((1.0 + lam) * og.reshape(P, n, d)
                          - (lam / n) * vs[:, None, :]).reshape(P * n, d)
                head_outs.append(og.astype(dtype))
            group_outs.append(jnp.concatenate(head_outs, axis=1))
        out_all = jnp.concatenate(group_outs, axis=0)
        br = jax.lax.dot_general(
            out_all, wp_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bp_ref[0]
        if has_dps:
            br = br * dps_ref[0, 0, 0]
        y = _win_unpack(br, T, W, win, C)       # residual in image layout
        if res:
            y = y + xf
        out_ref[...] = y.reshape(1, T, W, C).astype(out_ref.dtype)


def _attn_weights_fit(C: int, itemsize: int) -> bool:
    """Whether the full [C, 3C] qkv + [C, C] proj mats can stay resident
    in the unsplit attention kernel (fp32 C=896: 12.8 MB, measured over
    scoped VMEM next to the token copies on v5e)."""
    return 4 * C * C * itemsize <= (8 << 20)


_REMAT_DEPTH = 0


@contextlib.contextmanager
def remat_tile_headroom():
    """Halve the row-tile budgets while tracing rematerialized blocks.

    Measured on v5e (VALIDATION.md r3): under ``jax.checkpoint`` the
    res-128 attention kernel's scoped-VMEM allocation lands 1.1% over
    the 16 MB limit with the default budget; half the budget (= the
    validated ``FAIRM_ATTN_T_MB=2`` operating point) compiles and runs
    at equal throughput. UformerLayer enters this around its block loop
    when ``remat`` is on."""
    global _REMAT_DEPTH
    _REMAT_DEPTH += 1
    try:
        yield
    finally:
        _REMAT_DEPTH -= 1


def _tile_budget(default_mb: int, env_key: str, itemsize: int) -> int:
    """Row-tile byte budget. An explicit env override is taken verbatim;
    otherwise the default is scaled down for 4-byte operands (the
    input/qkv/out blocks double, measured 548 KB over the scoped-VMEM
    limit in fp32 at res 128) and halved under remat (see
    :func:`remat_tile_headroom`)."""
    env = os.environ.get(env_key)
    if env is not None:
        return int(env) << 20
    budget = (default_mb << 20) * 2 // itemsize
    if _REMAT_DEPTH:
        budget //= 2
    return budget


def use_split_kernels() -> bool:
    """Opt-in gate for the split fused kernels at stages whose full-width
    weights outgrow scoped VMEM (fp32 at C=896). NEGATIVE RESULT, default
    OFF (v5e, r4): with the splits the fp32 flagship eval runs 2.59 MP/s
    vs 2.69 on the unfused fallback (which still routes attention through
    the per-head window-attention kernel) — the serial weight-block
    substeps and their LN/x-tile revisits cost more than the fused
    elementwise chain saves at those dims. Both split kernels are
    on-chip-verified capabilities (FAIRM_SPLIT_KERNELS=1)."""
    return (os.environ.get("FAIRM_SPLIT_KERNELS", "0")
            not in ("0", "false", "False"))


def block_kernels_fit(C: int, Hd: int, itemsize: int) -> bool:
    """Whether the fused block kernels take this stage. Where the
    full-width weight mats outgrow scoped VMEM (fp32 at C=896: 24.6 MB
    of FFN weights, 12.8 MB of qkv+proj — measured over the limit on
    v5e, VALIDATION.md r3) the dispatchers CAN switch to split kernels
    (:func:`_ffn_kernel_split`, :func:`_attn_kernel_split`) — but the
    measured default is the unfused fallback, see
    :func:`use_split_kernels`."""
    attn_w = 4 * C * C * itemsize            # [C, 3C] qkv + [C, C] proj
    ffn_w = 2 * C * Hd * itemsize + 9 * Hd * 4
    if attn_w <= (12 << 20) and ffn_w <= (13 << 20):
        return True
    if not use_split_kernels():
        return False
    kb = _ffn_choose_kb(C, Hd, itemsize)
    return (2 * C * C * itemsize <= (12 << 20)
            and 2 * C * (Hd // kb) * itemsize + 9 * (Hd // kb) * 4
            <= (13 << 20))


def _choose_t(H: int, W: int, win: int, C: int, itemsize: int = 2) -> int:
    """Rows per tile: multiples of win; grow while the packed fp32 token
    copies (~6 of [M, C] across LN/residual/per-head temporaries) stay
    under ~4 MB of kernel stack (measured: 6 MB put the encoder stage-0
    intra call 388 KB over the 16 MB scoped-VMEM limit)."""
    budget = _tile_budget(4, "FAIRM_ATTN_T_MB", itemsize)
    t = win
    while (t * 2 <= H and H % (t * 2) == 0
           and 6 * (t * 2) * W * C * 4 <= budget):
        t *= 2
    return t


def _attn_forward(x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp,
                  bias, mask, lam, win: int, eps: float, interpret,
                  ln: bool = True, res: bool = True,
                  bias_groups: int = 1, dps=None):
    """Generalized fused attention-half forward. ``bias`` is
    ``[bias_groups, h, n, n]`` when bias_groups > 1 (per-band tables for
    the frequency intra attention; batch is band-major, band = b // (B //
    bias_groups)) else ``[h, n, n]`` shared. ``dps`` is an optional
    ``[B]`` per-image DropPath branch scale (stochastic depth applied
    in-kernel: out = x + dps_b * branch — saves the external fp32 lerp's
    HBM passes in training); requires ``res=True``."""
    interpret = _resolve_interpret(interpret)
    B, H, W, C = x_img.shape
    h = wq3.shape[0]
    n = win * win
    nw_row = W // win
    T = _choose_t(H, W, win, C, jnp.dtype(x_img.dtype).itemsize)
    nw_tile = (T // win) * nw_row
    # Windows packed per logits matmul: more windows -> fewer, larger MXU
    # ops in the serial group loop, at the cost of P^2-n^2 wasted
    # (-1e9-masked) cross-window logits and h*(P*n)^2 fp32 of packed-bias
    # VMEM. Bounded so the bias tile stays <=2 MB. Default 2 (256-row
    # logits tiles): measured +4% e2e over 1 on v5e (VALIDATION.md r3
    # sweep); 4 failed to compile at the flagship operating point.
    pmax = max(1, (128 * int(os.environ.get("FAIRM_ATTN_P", "2"))) // n)
    while pmax > 1 and h * (pmax * n) ** 2 * 4 > (2 << 20):
        pmax //= 2
    P = max(1, min(pmax, nw_tile))
    while nw_tile % P != 0:
        P -= 1
    G = nw_tile // P
    nI = H // T

    # Q-packing: at the deep low-res stages a grid step is only
    # M = nw_tile*n = 64-512 rows — a fraction of an MXU pass — so pack Q
    # whole images per grid step (windows never span images because
    # T % win == 0; masks repeat per image; lam stays per-image via
    # lam_ref[q]). Target Q*M <= FAIRM_ATTN_Q rows (default 512) with the
    # fp32 token copies capped at 8 MB; Q=1 at res >= 64 by construction.
    M = nw_tile * n
    q_rows = int(os.environ.get("FAIRM_ATTN_Q", "512"))
    q_imgs = B // bias_groups          # images per band (band-major batch)
    Q = 1
    for cand in range(min(B, max(1, q_rows // M)), 1, -1):
        if (q_imgs % cand == 0 and cand * M <= q_rows
                and 6 * cand * T * W * C * 4 <= (8 << 20)):
            Q = cand
            break

    has_mask = mask is not None
    has_lam = lam is not None

    # weights in the compute dtype; full-width [C, 3C] / [C, C] mats (see
    # below) — shared by both kernel layouts. The attention scale d^-0.5
    # is folded into the q weights/bias here: exact same logits, no
    # per-logit VPU multiply in the kernel.
    dt = x_img.dtype
    d = C // h
    scale = d ** -0.5
    ldt = dt if (dt == jnp.bfloat16 and _bf16_logits()) else jnp.float32
    wqkv_full = jnp.concatenate(
        [w.transpose(1, 0, 2).reshape(C, C) for w in
         (wq3 * scale, wk3, wv3)], axis=1).astype(dt)    # [C, 3C]
    bqkv_full = jnp.concatenate(
        [b.reshape(C) for b in (bq3 * scale, bk3, bv3)]).reshape(1, 3 * C)
    wp_full = wp3.reshape(C, C).astype(dt)

    # bias: [(NB,) h, n, n] -> packed [NB, h, P*n, P*n]
    # (diag blocks + -1e9 cross-window), stored in the logits dtype
    bias_nb = bias if bias_groups > 1 else bias[None]
    bias_p = (jnp.tile(bias_nb.astype(jnp.float32), (1, 1, P, P))
              + jnp.asarray(_pack_bias_np(P, n))[None, None]).astype(ldt)
    if bias_groups > 1:
        imgs_per_band = B // bias_groups
        bias_spec = pl.BlockSpec(
            (1, h, P * n, P * n),
            lambda b, i: ((b * Q) // imgs_per_band, 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        bias_spec = pl.BlockSpec((1, h, P * n, P * n),
                                 lambda b, i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    if has_mask:
        # mask: [nW, n, n] per window position, window-row-major. Group
        # into per-tile packed blocks [nI, G, P*n, P*n] (diagonal blocks;
        # cross-window blocks already -1e9 from the bias packing).
        nW = mask.shape[0]
        assert nW == (H // win) * nw_row
        m = mask.astype(jnp.float32).reshape(nI, G, P, n, n)
        mp = jnp.zeros((nI, G, P * n, P * n), jnp.float32)
        for p_ in range(P):
            mp = mp.at[:, :, p_ * n:(p_ + 1) * n,
                       p_ * n:(p_ + 1) * n].set(m[:, :, p_])
        mask_arr = mp.astype(ldt)
        mask_spec = pl.BlockSpec((1, G, P * n, P * n),
                                 lambda b, i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_arr = jnp.zeros((1, 1, P * n, P * n), ldt)
        mask_spec = pl.BlockSpec((1, 1, P * n, P * n),
                                 lambda b, i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    if has_lam:
        # [B, 1, h]: the leading batch dim is indexed by the grid (Q rows
        # per block under Q-packing); the trailing (1, h) block equals the
        # array dims (Mosaic requires last-two block dims divisible by
        # (8, 128) or full)
        lam_arr = lam.astype(jnp.float32).reshape(B, 1, h)
        lam_spec = pl.BlockSpec((Q, 1, h), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        lam_arr = jnp.zeros((1, 1, h), jnp.float32)
        lam_spec = pl.BlockSpec((1, 1, h), lambda b, i: (0, 0, 0),
                                memory_space=pltpu.VMEM)

    has_dps = dps is not None
    assert not (has_dps and not res), "dps requires the residual form"
    if has_dps:
        dps_arr = dps.astype(jnp.float32).reshape(B, 1, 1)
        dps_spec = pl.BlockSpec((Q, 1, 1), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        dps_arr = jnp.ones((1, 1, 1), jnp.float32)
        dps_spec = pl.BlockSpec((1, 1, 1), lambda b, i: (0, 0, 0),
                                memory_space=pltpu.VMEM)

    wqkv, bqkv, wp = wqkv_full, bqkv_full, wp_full

    if not _attn_weights_fit(C, jnp.dtype(dt).itemsize) and bias_groups == 1:
        # q/k/v-split path (fp32 at the deepest decoder stage): one [C, C]
        # projection block resident per substep, qkv built in scratch
        M = nw_tile * n
        kernel = functools.partial(
            _attn_kernel_split, T=T, W=W, C=C, h=h, win=win, P=P,
            eps=eps, has_mask=has_mask, has_lam=has_lam, has_dps=has_dps,
            ln=ln, res=res, dtype=dt, ldt=ldt)
        vs3 = lambda *shape: pl.BlockSpec(
            shape, lambda b, i, k: (0,) * len(shape),
            memory_space=pltpu.VMEM)
        if has_mask:
            mspec3 = pl.BlockSpec((1, G, P * n, P * n),
                                  lambda b, i, k: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        else:
            mspec3 = pl.BlockSpec((1, 1, P * n, P * n),
                                  lambda b, i, k: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        lspec3 = pl.BlockSpec(
            (1, 1, h),
            (lambda b, i, k: (b, 0, 0)) if has_lam
            else (lambda b, i, k: (0, 0, 0)),
            memory_space=pltpu.VMEM)
        dspec3 = pl.BlockSpec(
            (1, 1, 1),
            (lambda b, i, k: (b, 0, 0)) if has_dps
            else (lambda b, i, k: (0, 0, 0)),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B, nI, 3),
            in_specs=[
                pl.BlockSpec((1, T, W, C), lambda b, i, k: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                vs3(1, C), vs3(1, C),
                pl.BlockSpec((C, C), lambda b, i, k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda b, i, k: (0, k),
                             memory_space=pltpu.VMEM),
                vs3(C, C), vs3(1, C),
                pl.BlockSpec((1, h, P * n, P * n),
                             lambda b, i, k: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                mspec3, lspec3, dspec3,
            ],
            out_specs=pl.BlockSpec((1, T, W, C),
                                   lambda b, i, k: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
            scratch_shapes=[pltpu.VMEM((M, 3 * C), dt)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3),
            interpret=interpret,
        )(x_img, lns.reshape(1, C), lnb.reshape(1, C),
          wqkv, bqkv.astype(jnp.float32), wp, bp.reshape(1, C),
          bias_p, mask_arr, lam_arr, dps_arr)

    kernel = functools.partial(
        _attn_kernel, T=T, W=W, C=C, h=h, win=win, P=P, Q=Q, eps=eps,
        has_mask=has_mask, has_lam=has_lam, has_dps=has_dps, ln=ln,
        res=res, dtype=x_img.dtype, ldt=ldt)
    vspec = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // Q, nI),
        in_specs=[
            pl.BlockSpec((Q, T, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec(1, C), vspec(1, C),                          # ln
            vspec(C, 3 * C), vspec(1, 3 * C),                  # qkv
            vspec(C, C), vspec(1, C),                          # proj
            bias_spec,
            mask_spec, lam_spec, dps_spec,
        ],
        out_specs=pl.BlockSpec((Q, T, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x_img.dtype),
        interpret=interpret,
    )(x_img, lns.reshape(1, C), lnb.reshape(1, C),
      wqkv, bqkv.astype(jnp.float32), wp, bp.reshape(1, C),
      bias_p, mask_arr, lam_arr, dps_arr)


def _xla_block_attention(x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3,
                         wp3, bp, bias, mask, lam, win, eps,
                         route_kernel=False, interpret=False, dps=None):
    """Unfused reference composite (backward recompute + parity tests).
    Mirrors models/uformer_blocks.py attention_core + the all_DC fast
    path + LeWinBlock's LN1/partition/residual, on a pre-rolled image.

    ``route_kernel=True`` (the VJP backward's default, :func:`_use_fused_bwd`)
    swaps the einsum attention core for :func:`fused_window_attention`, whose
    forward AND backward are fused Pallas kernels — the LN/qkv/proj matmuls
    stay XLA (they are MXU-shaped already)."""
    B, H, W, C = x_img.shape
    h = wq3.shape[0]
    d = C // h
    n = win * win
    scale = d ** -0.5
    dtype = x_img.dtype

    xf = x_img.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * lns + lnb).astype(dtype)

    nwr, nwc = H // win, W // win
    xw = (xn.reshape(B, nwr, win, nwc, win, C)
            .transpose(0, 1, 3, 2, 4, 5).reshape(B * nwr * nwc, n, C))
    q = jnp.einsum("mnc,hcd->mhnd", xw, wq3.astype(dtype),
                   preferred_element_type=jnp.float32) + bq3[None, :, None]
    k = jnp.einsum("mnc,hcd->mhnd", xw, wk3.astype(dtype),
                   preferred_element_type=jnp.float32) + bk3[None, :, None]
    v = jnp.einsum("mnc,hcd->mhnd", xw, wv3.astype(dtype),
                   preferred_element_type=jnp.float32) + bv3[None, :, None]
    q, k, v = (t.astype(dtype) for t in (q, k, v))

    if route_kernel:
        from .window_attention import fused_window_attention

        out = fused_window_attention(
            q, k, v, bias.astype(jnp.float32), mask, scale, nwr * nwc,
            interpret).astype(jnp.float32)
    else:
        logits = jnp.einsum("mhnd,mhkd->mhnk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + bias.astype(jnp.float32)[None]
        if mask is not None:
            nW = mask.shape[0]
            m = mask.astype(jnp.float32)
            logits = (logits.reshape(B, nW, h, n, n) + m[None, :, None]
                      ).reshape(B * nW, h, n, n)
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("mhnk,mhkd->mhnd", p.astype(dtype), v,
                         preferred_element_type=jnp.float32)
    if lam is not None:
        lam_w = jnp.repeat(lam.astype(jnp.float32)[:, None], nwr * nwc,
                           axis=1).reshape(-1, h)    # [B*nW, h]
        vs = jnp.sum(v.astype(jnp.float32), axis=2)  # [B*nW, h, d]
        out = ((1.0 + lam_w)[:, :, None, None] * out
               - (lam_w / n)[:, :, None, None] * vs[:, :, None, :])
    proj = jnp.einsum("mhnd,hdc->mnc", out.astype(dtype),
                      wp3.astype(dtype),
                      preferred_element_type=jnp.float32) + bp
    y = (proj.reshape(B, nwr, nwc, win, win, C)
             .transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C))
    if dps is not None:
        y = y * dps.astype(jnp.float32)[:, None, None, None]
    return (xf + y).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16))
def fused_block_attention(x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3,
                          wp3, bp, bias, mask, lam, win: int = 8,
                          eps: float = 1e-6, interpret=None, dps=None):
    """``x + proj(win_attn(LN(x)))`` fused in VMEM, on a (pre-rolled)
    image.

    Args:
      x_img: ``[B, H, W, C]`` pre-LN tokens in image layout (already
        cyclically rolled when shift > 0 — the caller rolls back).
      lns, lnb: ``[C]`` LayerNorm scale/bias (eps via ``eps``).
      wq3/wk3/wv3: ``[h, C, d]`` per-head projection weights; bq3/bk3/bv3
        ``[h, d]``.
      wp3: ``[h, d, C]`` per-head output-projection slices; bp ``[C]``.
      bias: ``[h, n, n]`` relative-position bias.
      mask: ``[nW, n, n]`` additive SW-MSA mask (window-row-major over the
        image) or None.
      lam: ``[B, h]`` all_DC per-head gain or None.
      dps: ``[B]`` per-image DropPath branch scale (values {0, 1/keep})
        or None — stochastic depth applied in-kernel:
        ``out = x + dps_b * branch`` (models/uformer_lewin.py draws it
        through the same DropPath rng stream as the unfused path).
    Returns ``[B, H, W, C]`` in x's dtype.
    """
    impl = lambda *a: _attn_forward(*a[:14], win, eps, interpret,
                                    dps=a[14])
    return _spmd_call(
        impl,
        [(x_img, 0), (lns, None), (lnb, None), (wq3, None), (bq3, None),
         (wk3, None), (bk3, None), (wv3, None), (bv3, None), (wp3, None),
         (bp, None), (bias, None), (mask, None), (lam, 0), (dps, 0)])


def _attn_fwd(x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp,
              bias, mask, lam, win, eps, interpret, dps):
    out = fused_block_attention(x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3,
                                bv3, wp3, bp, bias, mask, lam, win, eps,
                                interpret, dps)
    return out, (x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp,
                 bias, mask, lam, dps)


def _cast_like(grads, primals):
    return tuple(None if g_ is None else g_.astype(p.dtype)
                 for g_, p in zip(grads, primals))


def _attn_bwd_supported(x_img, mask, win: int, bias_groups: int = 1):
    """Static decision for the fused backward kernel — batch-independent,
    so the global decision holds for every batch-sharded local shape."""
    from .lewin_block_bwd import attn_bwd_fits, use_bwd_kernel

    B, H, W, C = x_img.shape
    if not use_bwd_kernel() or H % win or W % win or B % bias_groups:
        return False
    if mask is not None and mask.shape[0] != (H // win) * (W // win):
        return False
    return attn_bwd_fits(C, win, W, jnp.dtype(x_img.dtype).itemsize)


def _attn_bwd(win, eps, interpret, res, g):
    (x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp, bias, mask,
     lam, dps) = res
    itp = _resolve_interpret(interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)

    # In-kernel DropPath out = x + s_b * f(x): the existing backward of
    # u = x + f(x) is reused unchanged by scaling the cotangent per image
    # (s is per-image and f acts per image, so f'(x)^T (s*g) = s * f'^T g
    # image-wise): feed it g' = s*g, then correct dx += (1 - s)*g. Branch
    # param grads come out exact with g'. dps is an rng draw -> no grad.
    g_eff = g
    ddps = None if dps is None else jnp.zeros_like(dps)
    if dps is not None:
        sf = dps.astype(jnp.float32)[:, None, None, None]
        g_eff = (g.astype(jnp.float32) * sf).astype(g.dtype)

    def _fix_dx(dx):
        if dps is None:
            return dx
        out = (dx.astype(jnp.float32)
               + (1.0 - sf) * g.astype(jnp.float32))
        return out.astype(dx.dtype)

    if _attn_bwd_supported(x_img, mask, win):
        from .lewin_block_bwd import attn_block_bwd

        impl = functools.partial(attn_block_bwd, win=win, eps=eps,
                                 interpret=itp, res=True, bias_groups=1)
        packed = (lambda *a: impl(*a)[:12]) if lam is None else impl
        grads = _spmd_call(
            packed,
            [(x_img, 0), (g_eff, 0), (lns, None), (lnb, None), (wq3, None),
             (bq3, None), (wk3, None), (bk3, None), (wv3, None),
             (bv3, None), (wp3, None), (bp, None), (bias, None),
             (mask, None), (lam, 0 if lam is not None else None)],
            out_batch_dims=(0,) + (None,) * 11
            + (() if lam is None else (0,)),
            reduced_out=tuple(range(1, 12)))
        grads = _cast_like(
            grads, (x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                    bp, bias) + (() if lam is None else (lam,)))
        dx_rest = (_fix_dx(grads[0]),) + grads[1:12]
        dlam = None if lam is None else grads[12]
        return dx_rest + (dmask, dlam, ddps)

    rk = _use_fused_bwd()
    diff = (x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp, bias)
    if lam is None:
        _, vjp = jax.vjp(
            lambda *a: _xla_block_attention(*a, mask, None, win, eps,
                                            route_kernel=rk, interpret=itp),
            *diff)
        grads = vjp(g_eff)
        return (_fix_dx(grads[0]),) + grads[1:] + (dmask, None, ddps)
    _, vjp = jax.vjp(
        lambda *a: _xla_block_attention(*a[:12], mask, a[12], win, eps,
                                        route_kernel=rk, interpret=itp),
        *(diff + (lam,)))
    grads = vjp(g_eff)
    return (_fix_dx(grads[0]),) + grads[1:12] + (dmask, grads[12], ddps)


fused_block_attention.defvjp(_attn_fwd, _attn_bwd)


# ---------------------------------------------------------------------------
# FFN half: LN2 -> LeFF -> residual
# ---------------------------------------------------------------------------


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


def _ffn_kernel(prev_ref, cur_ref, next_ref, lns_ref, lnb_ref, w1_ref,
                b1_ref, wd_ref, bd_ref, w2_ref, b2_ref, dps_ref, out_ref,
                *, T: int, W: int, C: int, Hd: int, eps: float,
                has_dps: bool, dtype):
    i = pl.program_id(1)

    x = jnp.concatenate(
        [prev_ref[0, T - 1:T], cur_ref[0], next_ref[0, 0:1]], axis=0)
    xf = x.astype(jnp.float32)                       # [T+2, W, C]
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * lns_ref[0] + lnb_ref[0]).astype(dtype)

    hdn = jax.lax.dot_general(
        xn.reshape((T + 2) * W, C), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hdn = _gelu(hdn + b1_ref[...]).reshape(T + 2, W, Hd)

    # zero the hidden halo rows at the image boundary (conv zero padding;
    # the clamped halo blocks otherwise carry duplicate rows)
    rows = jax.lax.broadcasted_iota(jnp.int32, (T + 2, 1, 1), 0)
    top = jnp.logical_and(i == 0, rows == 0)
    bot = jnp.logical_and(i == pl.num_programs(1) - 1, rows == T + 1)
    hdn = jnp.where(jnp.logical_or(top, bot), 0.0, hdn)

    zcol = jnp.zeros((T + 2, 1, Hd), jnp.float32)
    hp = jnp.concatenate([zcol, hdn, zcol], axis=1)  # [T+2, W+2, Hd]
    acc = jnp.zeros((T, W, Hd), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy, dx][None, None, :]
            acc = acc + hp[dy:dy + T, dx:dx + W] * tap
    acc = _gelu(acc + bd_ref[...])

    y = jax.lax.dot_general(
        acc.reshape(T * W, Hd).astype(dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2_ref[...]
    if has_dps:
        y = y * dps_ref[0, 0, 0]          # in-kernel DropPath branch scale
    y = y + cur_ref[0].astype(jnp.float32).reshape(T * W, C)
    out_ref[...] = y.reshape(1, T, W, C).astype(out_ref.dtype)


def _ffn_choose_t(H: int, W: int, Hd: int, itemsize: int = 2) -> int:
    budget = _tile_budget(4, "FAIRM_FFN_T_MB", itemsize)
    t = H
    while t > 1 and 3 * (t + 2) * (W + 2) * Hd * 4 > budget:
        for dd in range(t // 2, 0, -1):
            if H % dd == 0:
                t = dd
                break
        else:
            t = 1
    return t


def _ffn_choose_kb(C: int, Hd: int, itemsize: int) -> int:
    """Hidden-dim split factor: smallest KB dividing Hd into 128-multiple
    blocks whose w1/w2 column/row blocks fit ~10 MB of resident VMEM.
    KB=1 (no split) everywhere the full weights fit — the benched bf16
    configuration is unchanged (12.85 MB at C=896 fits, measured);
    fp32 at C=896 (24.6 MB of weights, measured 8.5 MB over scoped VMEM
    on v5e) gets KB=4. The budget scales inversely with itemsize because
    the fp32 token copies the weights share VMEM with double too."""
    budget = (13 << 20) * 2 // itemsize
    kb = 1
    while (2 * C * (Hd // kb) * itemsize + 9 * (Hd // kb) * 4 > budget
           and kb < Hd and Hd % (kb * 2) == 0
           and (Hd // (kb * 2)) % 128 == 0):
        kb *= 2
    return kb


def _ffn_kernel_split(prev_ref, cur_ref, next_ref, lns_ref, lnb_ref,
                      w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref,
                      dps_ref, out_ref, xn_s, acc_s, *, T: int, W: int,
                      C: int, HdB: int, KB: int, eps: float,
                      has_dps: bool, dtype):
    """Hd-split variant of :func:`_ffn_kernel`: grid (B, nI, KB). The
    hidden dim is exactly separable — each Hd block flows independently
    through linear1 -> gelu -> depthwise conv -> gelu -> its w2 row block,
    and the outputs SUM: y = sum_k gelu(dwconv(gelu(xn @ w1[:, k]))) @
    w2[k]. LN(x) is computed once into scratch at k=0; the fp32 partial
    sum accumulates in scratch and is written (+ bias + residual) at the
    last k."""
    i = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _ln():
        x = jnp.concatenate(
            [prev_ref[0, T - 1:T], cur_ref[0], next_ref[0, 0:1]], axis=0)
        xf = x.astype(jnp.float32)                   # [T+2, W, C]
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn_s[...] = (xn * lns_ref[0] + lnb_ref[0]).astype(dtype)
        acc_s[...] = jnp.zeros_like(acc_s)

    hdn = jax.lax.dot_general(
        xn_s[...].reshape((T + 2) * W, C), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hdn = _gelu(hdn + b1_ref[0]).reshape(T + 2, W, HdB)

    rows = jax.lax.broadcasted_iota(jnp.int32, (T + 2, 1, 1), 0)
    top = jnp.logical_and(i == 0, rows == 0)
    bot = jnp.logical_and(i == pl.num_programs(1) - 1, rows == T + 1)
    hdn = jnp.where(jnp.logical_or(top, bot), 0.0, hdn)

    zcol = jnp.zeros((T + 2, 1, HdB), jnp.float32)
    hp = jnp.concatenate([zcol, hdn, zcol], axis=1)  # [T+2, W+2, HdB]
    acc = jnp.zeros((T, W, HdB), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy, dx][None, None, :]
            acc = acc + hp[dy:dy + T, dx:dx + W] * tap
    acc = _gelu(acc + bd_ref[0][None])

    y = jax.lax.dot_general(
        acc.reshape(T * W, HdB).astype(dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_s[...] = acc_s[...] + y

    @pl.when(k == KB - 1)
    def _emit():
        br = acc_s[...] + b2_ref[0]
        if has_dps:
            br = br * dps_ref[0, 0, 0]
        out = br + cur_ref[0].astype(jnp.float32).reshape(T * W, C)
        out_ref[...] = out.reshape(1, T, W, C).astype(out_ref.dtype)


def _ffn_forward(x_img, lns, lnb, w1, b1, wd, bd, w2, b2, eps: float,
                 interpret, dps=None):
    interpret = _resolve_interpret(interpret)
    B, H, W, C = x_img.shape
    Hd = w1.shape[1]
    T = _ffn_choose_t(H, W, Hd, jnp.dtype(x_img.dtype).itemsize)
    nI = H // T
    dtype = x_img.dtype
    w1 = w1.astype(dtype)
    w2 = w2.astype(dtype)
    b1, bd, b2 = (t.astype(jnp.float32) for t in (b1, bd, b2))
    wd = wd.astype(jnp.float32)

    has_dps = dps is not None
    if has_dps:
        dps_arr = dps.astype(jnp.float32).reshape(B, 1, 1)
        dmap2 = lambda b, i: (b, 0, 0)
        dmap3 = lambda b, i, k: (b, 0, 0)
    else:
        dps_arr = jnp.ones((1, 1, 1), jnp.float32)
        dmap2 = lambda b, i: (0, 0, 0)
        dmap3 = lambda b, i, k: (0, 0, 0)

    itemsize = jnp.dtype(dtype).itemsize
    KB = _ffn_choose_kb(C, Hd, itemsize)
    if KB > 1:
        # Hd-split path: fp32 at the deepest stage (the full fp32 weights
        # measured 8.5 MB over scoped VMEM on v5e, VALIDATION.md r3)
        HdB = Hd // KB
        kernel = functools.partial(_ffn_kernel_split, T=T, W=W, C=C,
                                   HdB=HdB, KB=KB, eps=eps,
                                   has_dps=has_dps, dtype=dtype)
        vspec3 = lambda *shape: pl.BlockSpec(
            shape, lambda b, i, k: (0,) * len(shape),
            memory_space=pltpu.VMEM)
        xspec3 = lambda imap: pl.BlockSpec((1, T, W, C), imap,
                                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B, nI, KB),
            in_specs=[
                xspec3(lambda b, i, k: (b, jnp.maximum(i - 1, 0), 0, 0)),
                xspec3(lambda b, i, k: (b, i, 0, 0)),
                xspec3(lambda b, i, k: (b, jnp.minimum(i + 1, nI - 1),
                                        0, 0)),
                vspec3(1, C), vspec3(1, C),
                pl.BlockSpec((C, HdB), lambda b, i, k: (0, k),
                             memory_space=pltpu.VMEM),
                # 2-D bias blocks: 1-D operands get (1024,) tiling on
                # TPU, which a 896-wide block cannot divide (measured
                # Mosaic reject); (1, HdB) tiles as (8, 128)
                pl.BlockSpec((1, HdB), lambda b, i, k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 3, HdB), lambda b, i, k: (0, 0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HdB), lambda b, i, k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HdB, C), lambda b, i, k: (k, 0),
                             memory_space=pltpu.VMEM),
                vspec3(1, C),
                pl.BlockSpec((1, 1, 1), dmap3, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, W, C),
                                   lambda b, i, k: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), dtype),
            scratch_shapes=[
                pltpu.VMEM((T + 2, W, C), dtype),      # xn (post-LN)
                pltpu.VMEM((T * W, C), jnp.float32),   # fp32 partial sum
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3),
            interpret=interpret,
        )(x_img, x_img, x_img, lns.reshape(1, C), lnb.reshape(1, C),
          w1, b1.reshape(1, Hd), wd, bd.reshape(1, Hd), w2,
          b2.reshape(1, C), dps_arr)

    kernel = functools.partial(_ffn_kernel, T=T, W=W, C=C, Hd=Hd, eps=eps,
                               has_dps=has_dps, dtype=dtype)
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
            vspec(1, C), vspec(1, C),
            vspec(C, Hd), vspec(Hd), vspec(3, 3, Hd), vspec(Hd),
            vspec(Hd, C), vspec(C),
            pl.BlockSpec((1, 1, 1), dmap2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dtype),
        interpret=interpret,
    )(x_img, x_img, x_img, lns.reshape(1, C), lnb.reshape(1, C),
      w1, b1, wd, bd, w2, b2, dps_arr)


def _xla_block_ffn(x_img, lns, lnb, w1, b1, wd, bd, w2, b2, eps,
                   dps=None):
    """Unfused LN2+LeFF+residual (backward recompute + parity tests)."""
    dtype = x_img.dtype
    xf = x_img.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * lns + lnb).astype(dtype)
    h = _gelu(jnp.einsum("bhwc,cd->bhwd", xn, w1.astype(dtype),
                         preferred_element_type=jnp.float32) + b1)
    h = jax.lax.conv_general_dilated(
        h, wd[..., None, :].astype(h.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=wd.shape[-1])
    h = _gelu(h + bd)
    y = jnp.einsum("bhwd,dc->bhwc", h.astype(dtype), w2.astype(dtype),
                   preferred_element_type=jnp.float32) + b2
    if dps is not None:
        y = y * dps.astype(jnp.float32)[:, None, None, None]
    return (xf + y).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_block_ffn(x_img, lns, lnb, w1, b1, wd, bd, w2, b2,
                    eps: float = 1e-6, interpret=None, dps=None):
    """``x + linear2(gelu(dwconv(gelu(linear1(LN(x))))))`` fused in VMEM.

    Args:
      x_img: ``[B, H, W, C]`` post-attention tokens in image layout.
      lns, lnb: ``[C]`` LayerNorm scale/bias.
      w1 ``[C, Hd]``, b1 ``[Hd]``, wd ``[3, 3, Hd]`` depthwise taps,
      bd ``[Hd]``, w2 ``[Hd, C]``, b2 ``[C]``.
      dps: optional ``[B]`` per-image DropPath branch scale
        (``out = x + dps_b * branch``, stochastic depth in-kernel).
    Returns ``[B, H, W, C]`` in x's dtype.
    """
    impl = lambda *a: _ffn_forward(*a[:9], eps, interpret, dps=a[9])
    return _spmd_call(
        impl,
        [(x_img, 0), (lns, None), (lnb, None), (w1, None), (b1, None),
         (wd, None), (bd, None), (w2, None), (b2, None), (dps, 0)])


def _ffn_fwd(x_img, lns, lnb, w1, b1, wd, bd, w2, b2, eps, interpret,
             dps):
    out = fused_block_ffn(x_img, lns, lnb, w1, b1, wd, bd, w2, b2, eps,
                          interpret, dps)
    return out, (x_img, lns, lnb, w1, b1, wd, bd, w2, b2, dps)


def _ffn_bwd(eps, interpret, res, g):
    x_img, lns, lnb, w1, b1, wd, bd, w2, b2, dps = res
    from .lewin_block_bwd import (ffn_bwd_fits, _ffn_bwd_choose_t,
                                  use_bwd_kernel)

    # in-kernel DropPath: see _attn_bwd — scale the cotangent, correct dx
    g_eff = g
    ddps = None if dps is None else jnp.zeros_like(dps)
    if dps is not None:
        sf = dps.astype(jnp.float32)[:, None, None, None]
        g_eff = (g.astype(jnp.float32) * sf).astype(g.dtype)

    def _fix_dx(dx):
        if dps is None:
            return dx
        out = (dx.astype(jnp.float32)
               + (1.0 - sf) * g.astype(jnp.float32))
        return out.astype(dx.dtype)

    B, H, W, C = x_img.shape
    Hd = w1.shape[1]
    itemsize = jnp.dtype(x_img.dtype).itemsize
    t = _ffn_bwd_choose_t(H, W, Hd, itemsize)
    if (use_bwd_kernel() and ffn_bwd_fits(C, Hd, W, itemsize)
            and t >= 2 and H % t == 0):
        from .lewin_block_bwd import ffn_block_bwd

        itp = _resolve_interpret(interpret)
        impl = functools.partial(ffn_block_bwd, eps=eps, interpret=itp)
        grads = _spmd_call(
            impl,
            [(x_img, 0), (g_eff, 0), (lns, None), (lnb, None), (w1, None),
             (b1, None), (wd, None), (bd, None), (w2, None), (b2, None)],
            out_batch_dims=(0,) + (None,) * 8,
            reduced_out=tuple(range(1, 9)))
        grads = _cast_like(grads,
                           (x_img, lns, lnb, w1, b1, wd, bd, w2, b2))
        return (_fix_dx(grads[0]),) + grads[1:] + (ddps,)

    _, vjp = jax.vjp(lambda *a: _xla_block_ffn(*a, eps),
                     x_img, lns, lnb, w1, b1, wd, bd, w2, b2)
    grads = vjp(g_eff)
    return (_fix_dx(grads[0]),) + grads[1:] + (ddps,)


fused_block_ffn.defvjp(_ffn_fwd, _ffn_bwd)


# Negative result (v5e, r3): routing the FFN half to the XLA composite at
# res <= 32 — where the composite beats the kernel 0.78-0.91x IN ISOLATION
# (it batches all images into one MXU matmul) — is a 60% e2e LOSS
# (212 ms vs 133 at B=32). The isolated advantage does not survive
# composition: alternating XLA/Pallas stages breaks the back-to-back
# pallas_call pipelining and reintroduces HBM-layout round-trips. The
# fused kernel stays the FFN path at every stage.


# ---------------------------------------------------------------------------
# Frequency-MSA halves (encoder): per-band intra + grouped cross-band inter
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def fused_freq_intra(x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                     bp, biasA, mask, L: int, win: int = 8,
                     eps: float = 1e-6, interpret=None):
    """Intra-band half of the frequency-MSA block:
    ``proj(win_attn_per_band(LN(x)))`` (NO residual — the inter half adds
    it). ``x_img: [L*B, H, W, C]`` band-major folded batch (pre-rolled);
    ``biasA: [L, h, n, n]`` per-band diagonal relative-position tables.

    Exactness: the reference computes intra attention on the grouped
    ``(L*n)``-token window with a -100 cross-band mask
    (encoder_Uformer.py:190-313); softmax turns -100 into e^-100 ~ 3.7e-44,
    so the grouped form decomposes into L independent per-band attentions
    to < 1e-40 relative error (see FrequencyWindowAttention's band-fold
    note). This kernel computes the per-band form — 1/L the logits FLOPs.
    """
    return _attn_forward(x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3,
                         wp3, bp, biasA, mask, None, win, eps, interpret,
                         ln=True, res=False, bias_groups=L)


def _xla_freq_intra(x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                    bp, biasA, mask, L, win, eps,
                    route_kernel=False, interpret=False):
    """Unfused per-band intra composite (backward recompute + tests).
    ``route_kernel``: attention core via :func:`fused_window_attention`,
    one call per band (the bias table is band-dependent)."""
    LB, H, W, C = x_img.shape
    B = LB // L
    h = wq3.shape[0]
    d = C // h
    n = win * win
    scale = d ** -0.5
    dtype = x_img.dtype

    xf = x_img.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * lns + lnb).astype(dtype)

    nwr, nwc = H // win, W // win
    xw = (xn.reshape(LB, nwr, win, nwc, win, C)
            .transpose(0, 1, 3, 2, 4, 5).reshape(LB * nwr * nwc, n, C))
    q = jnp.einsum("mnc,hcd->mhnd", xw, wq3.astype(dtype),
                   preferred_element_type=jnp.float32) + bq3[None, :, None]
    k = jnp.einsum("mnc,hcd->mhnd", xw, wk3.astype(dtype),
                   preferred_element_type=jnp.float32) + bk3[None, :, None]
    v = jnp.einsum("mnc,hcd->mhnd", xw, wv3.astype(dtype),
                   preferred_element_type=jnp.float32) + bv3[None, :, None]
    q, k, v = (t.astype(dtype) for t in (q, k, v))

    nW = nwr * nwc
    if route_kernel:
        from .window_attention import fused_window_attention

        BW = B * nW  # windows per band (batch is band-major)
        out = jnp.concatenate([
            fused_window_attention(
                q[l * BW:(l + 1) * BW], k[l * BW:(l + 1) * BW],
                v[l * BW:(l + 1) * BW], biasA[l].astype(jnp.float32),
                mask, scale, nW, interpret)
            for l in range(L)], axis=0).astype(jnp.float32)
    else:
        logits = jnp.einsum("mhnd,mhkd->mhnk", q, k,
                            preferred_element_type=jnp.float32) * scale
        # per-band bias: window m belongs to band (m // (B*nW))
        logits = (logits.reshape(L, B * nW, h, n, n)
                  + biasA.astype(jnp.float32)[:, None]).reshape(-1, h, n, n)
        if mask is not None:
            m = mask.astype(jnp.float32)
            logits = (logits.reshape(LB, nW, h, n, n) + m[None, :, None]
                      ).reshape(-1, h, n, n)
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("mhnk,mhkd->mhnd", p.astype(dtype), v,
                         preferred_element_type=jnp.float32)
    proj = jnp.einsum("mhnd,hdc->mnc", out.astype(dtype),
                      wp3.astype(dtype),
                      preferred_element_type=jnp.float32) + bp
    y = (proj.reshape(LB, nwr, nwc, win, win, C)
             .transpose(0, 1, 3, 2, 4, 5).reshape(LB, H, W, C))
    return y.astype(dtype)


def _freq_intra_fwd(x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                    bp, biasA, mask, L, win, eps, interpret):
    out = fused_freq_intra(x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3,
                           wp3, bp, biasA, mask, L, win, eps, interpret)
    return out, (x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp,
                 biasA, mask)


def _freq_intra_bwd(L, win, eps, interpret, res, g):
    (x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp, biasA,
     mask) = res
    itp = _resolve_interpret(interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)

    # fused backward kernel (band-folded batch is NOT batch-partitioned,
    # matching the forward: bands are batch-major and a shard boundary
    # could not know its band offset for the per-band bias tables)
    if _attn_bwd_supported(x_img, mask, win, bias_groups=L):
        from .lewin_block_bwd import attn_block_bwd

        grads = attn_block_bwd(x_img, g, lns, lnb, wq3, bq3, wk3, bk3,
                               wv3, bv3, wp3, bp, biasA, mask, None,
                               win=win, eps=eps, interpret=itp,
                               res=False, bias_groups=L)
        if grads is not None:
            grads = _cast_like(
                grads[:12],
                (x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp,
                 biasA))
            return grads + (dmask,)

    rk = _use_fused_bwd()
    diff = (x_img, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp, biasA)
    _, vjp = jax.vjp(
        lambda *a: _xla_freq_intra(*a, mask, L, win, eps,
                                   route_kernel=rk, interpret=itp), *diff)
    return vjp(g) + (dmask,)


fused_freq_intra.defvjp(_freq_intra_fwd, _freq_intra_bwd)


def _freq_inter_kernel(y_ref, res_ref, wqkv_ref, bqkv_ref, wp_ref,
                       bp_ref, bias_ref, mask_ref, dps_ref, out_ref, *,
                       L: int, T: int, W: int, C: int, h: int, win: int,
                       has_mask: bool, has_dps: bool, dtype,
                       ldt=jnp.float32):
    n = win * win
    nw = (T // win) * (W // win)
    Ln = L * n
    d = C // h

    y = y_ref[:, 0]                                  # [L, T, W, C]
    # window-grouped tokens: [nw, L, n, C] -> [nw*L*n, C]
    z = jnp.stack([_win_pack(y[l].astype(dtype), T, W, win, C)
                   for l in range(L)], axis=0)       # [L, nw*n, C]
    z = (z.reshape(L, nw, n, C).transpose(1, 0, 2, 3)
          .reshape(nw * Ln, C))

    # full-width one-shot qkv (see _attn_kernel)
    qkv = jax.lax.dot_general(
        z, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv = qkv.astype(dtype)                          # [nw*Ln, 3C]

    win_outs = []
    for j in range(nw):
        s = slice(j * Ln, (j + 1) * Ln)
        mtile = (jnp.tile(mask_ref[0, j], (L, L)) if has_mask else None)
        head_outs = []
        for hh in range(h):
            q = qkv[s, hh * d:(hh + 1) * d]
            k = qkv[s, C + hh * d:C + (hh + 1) * d]
            v = qkv[s, 2 * C + hh * d:2 * C + (hh + 1) * d]
            # q scale folded into the qkv weights; logits stored in ldt
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(ldt)
            logits = logits + bias_ref[hh]
            if has_mask:
                logits = logits + mtile
            e = jnp.exp(_softmax_shift(logits))
            # normalize after e@v (see _attn_kernel): divide [Ln, d], not
            # the [Ln, Ln] logits area
            head_outs.append((jax.lax.dot_general(
                e.astype(dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                / jnp.sum(e, axis=-1, keepdims=True,
                          dtype=jnp.float32)).astype(dtype))
        win_outs.append(jnp.concatenate(head_outs, axis=1))  # [Ln, C]
    out_all = jnp.concatenate(win_outs, axis=0)      # [nw*Ln, C]
    acc = jax.lax.dot_general(
        out_all, wp_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + bp_ref[0]

    # back to band-major + residual (dps: per-folded-sample DropPath
    # branch scale — the whole MSA output (intra+inter) is the branch,
    # so the scale applies here where the shortcut is added)
    accb = (acc.reshape(nw, L, n, C).transpose(1, 0, 2, 3)
               .reshape(L, nw * n, C))
    for l in range(L):
        br = _win_unpack(accb[l], T, W, win, C)
        if has_dps:
            br = br * dps_ref[0, l, 0]
        out_ref[l, 0] = (br + res_ref[l, 0].astype(jnp.float32)
                         ).astype(out_ref.dtype)


def _freq_inter_forward(y_img, res_img, wq3, bq3, wk3, bk3, wv3, bv3,
                        wp3, bp, biasB, mask, L, win, eps, interpret,
                        dps=None):
    interpret = _resolve_interpret(interpret)
    LB, H, W, C = y_img.shape
    B = LB // L
    h = wq3.shape[0]
    n = win * win
    d = C // h
    nw_row = W // win

    # rows per tile: the per-window (L*n)^2 logits/probs pairs dominate
    # the kernel stack; keep ~nw * 2 * (Ln)^2 * 4 under ~5 MB (scaled
    # down for fp32 operands / remat headroom like the other choosers)
    # default 4 since r4: with the static softmax shift Mosaic's stack
    # schedule keeps logits+e alive together and the budget-5 tiling
    # landed 88 KB over scoped VMEM at the C=112/res-32 encoder stage
    inter_budget = _tile_budget(4, "FAIRM_INTER_T_MB",
                                jnp.dtype(y_img.dtype).itemsize)
    T = win
    while (T * 2 <= H and H % (T * 2) == 0
           and ((T * 2) // win) * nw_row * 2 * (L * n) ** 2 * 4
           <= inter_budget):
        T *= 2
    nI = H // T
    nw = (T // win) * nw_row

    y5 = y_img.reshape(L, B, H, W, C)
    r5 = res_img.reshape(L, B, H, W, C)
    dt = y_img.dtype
    ldt = dt if (dt == jnp.bfloat16 and _bf16_logits()) else jnp.float32
    has_mask = mask is not None
    if has_mask:
        m = mask.astype(ldt).reshape(nI, nw, n, n)
        mask_spec = pl.BlockSpec((1, nw, n, n), lambda b, i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        m = jnp.zeros((1, 1, n, n), ldt)
        mask_spec = pl.BlockSpec((1, 1, n, n), lambda b, i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    scale = d ** -0.5
    wqkv = jnp.concatenate(
        [w.transpose(1, 0, 2).reshape(C, C) for w in
         (wq3 * scale, wk3, wv3)], axis=1).astype(dt)    # [C, 3C]
    bqkv = jnp.concatenate(
        [b.reshape(C) for b in (bq3 * scale, bk3, bv3)]
    ).reshape(1, 3 * C).astype(jnp.float32)
    wp = wp3.reshape(C, C).astype(dt)
    has_dps = dps is not None
    if has_dps:
        # image-major [B, L, 1]: the grid indexes the leading dim and the
        # trailing (L, 1) block equals the full array dims (Mosaic needs
        # the last-two block dims full or (8, 128)-aligned)
        dps_arr = (dps.astype(jnp.float32).reshape(L, B)
                   .T.reshape(B, L, 1))
        dps_spec = pl.BlockSpec((1, L, 1), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        dps_arr = jnp.ones((1, L, 1), jnp.float32)
        dps_spec = pl.BlockSpec((1, L, 1), lambda b, i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _freq_inter_kernel, L=L, T=T, W=W, C=C, h=h, win=win,
        has_mask=has_mask, has_dps=has_dps, dtype=y_img.dtype, ldt=ldt)
    vspec = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((L, 1, T, W, C), lambda b, i: (0, b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, nI),
        in_specs=[
            xspec, xspec,
            vspec(C, 3 * C), vspec(1, 3 * C),
            vspec(C, C), vspec(1, C),
            vspec(h, L * n, L * n),
            mask_spec, dps_spec,
        ],
        out_specs=pl.BlockSpec((L, 1, T, W, C),
                               lambda b, i: (0, b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, B, H, W, C), y_img.dtype),
        interpret=interpret,
    )(y5, r5, wqkv, bqkv, wp, bp.reshape(1, C),
      biasB.astype(ldt), m, dps_arr)
    return out.reshape(LB, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def fused_freq_inter(y_img, res_img, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                     bp, biasB, mask, L: int = 1, win: int = 8,
                     eps: float = 1e-6, interpret=None, dps=None):
    """Inter-band half of the frequency-MSA block:
    ``res + proj(grouped_attn(y))`` where the attention runs over the
    window-grouped ``(L*n)``-token sequence with the cross-band-only bias
    ``biasB [h, L*n, L*n]`` (the L x L relative-position tables plus the
    'inter' band mask, encoder_Uformer.py:259-313). ``res_img`` is the
    block's shortcut (pre-LN1 x). Shapes as :func:`fused_freq_intra`.
    ``dps``: optional ``[L*B]`` per-folded-sample DropPath branch scale
    (the whole intra+inter MSA output is the DropPath branch; its
    shortcut is added here, so the scale applies here).
    """
    return _freq_inter_forward(y_img, res_img, wq3, bq3, wk3, bk3, wv3,
                               bv3, wp3, bp, biasB, mask, L, win, eps,
                               interpret, dps=dps)


def _xla_freq_inter(y_img, res_img, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                    bp, biasB, mask, L, win, eps,
                    route_kernel=False, interpret=False):
    LB, H, W, C = y_img.shape
    B = LB // L
    h = wq3.shape[0]
    d = C // h
    n = win * win
    Ln = L * n
    scale = d ** -0.5
    dtype = y_img.dtype

    nwr, nwc = H // win, W // win
    nW = nwr * nwc
    xw = (y_img.reshape(LB, nwr, win, nwc, win, C)
               .transpose(0, 1, 3, 2, 4, 5).reshape(L, B * nW, n, C))
    z = xw.transpose(1, 0, 2, 3).reshape(B * nW, Ln, C)
    q = jnp.einsum("mnc,hcd->mhnd", z, wq3.astype(dtype),
                   preferred_element_type=jnp.float32) + bq3[None, :, None]
    k = jnp.einsum("mnc,hcd->mhnd", z, wk3.astype(dtype),
                   preferred_element_type=jnp.float32) + bk3[None, :, None]
    v = jnp.einsum("mnc,hcd->mhnd", z, wv3.astype(dtype),
                   preferred_element_type=jnp.float32) + bv3[None, :, None]
    q, k, v = (t.astype(dtype) for t in (q, k, v))
    if route_kernel:
        from .window_attention import fused_window_attention

        mt = (None if mask is None
              else jnp.tile(mask.astype(jnp.float32), (1, L, L)))
        out = fused_window_attention(
            q, k, v, biasB.astype(jnp.float32), mt, scale, nW,
            interpret).astype(jnp.float32)
    else:
        logits = jnp.einsum("mhnd,mhkd->mhnk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + biasB.astype(jnp.float32)[None]
        if mask is not None:
            m = jnp.tile(mask.astype(jnp.float32), (1, L, L))
            logits = (logits.reshape(B, nW, h, Ln, Ln) + m[None, :, None]
                      ).reshape(-1, h, Ln, Ln)
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("mhnk,mhkd->mhnd", p.astype(dtype), v,
                         preferred_element_type=jnp.float32)
    proj = jnp.einsum("mhnd,hdc->mnc", out.astype(dtype),
                      wp3.astype(dtype),
                      preferred_element_type=jnp.float32) + bp
    y = (proj.reshape(B, nW, L, n, C).transpose(2, 0, 1, 3, 4)
             .reshape(LB, nW, n, C)
             .reshape(LB, nwr, nwc, win, win, C)
             .transpose(0, 1, 3, 2, 4, 5).reshape(LB, H, W, C))
    return (res_img.astype(jnp.float32) + y).astype(dtype)


def _freq_inter_fwd(y_img, res_img, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                    bp, biasB, mask, L, win, eps, interpret, dps):
    out = fused_freq_inter(y_img, res_img, wq3, bq3, wk3, bk3, wv3, bv3,
                           wp3, bp, biasB, mask, L, win, eps, interpret,
                           dps)
    return out, (y_img, res_img, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp,
                 biasB, mask, dps)


def _freq_inter_bwd(L, win, eps, interpret, res, g):
    (y_img, res_img, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp, biasB,
     mask, dps) = res
    itp = _resolve_interpret(interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)

    # in-kernel DropPath out = res + s*f(y): the branch grads (dy and
    # weight grads) are the plain backward fed the scaled cotangent s*g
    # (per-folded-sample s commutes with the per-sample branch); the
    # residual grad stays the UNSCALED g. dps is an rng draw -> no grad.
    g_eff = g
    ddps = None if dps is None else jnp.zeros_like(dps)
    if dps is not None:
        sf = dps.astype(jnp.float32)[:, None, None, None]
        g_eff = (g.astype(jnp.float32) * sf).astype(g.dtype)

    from .lewin_block_bwd import freq_inter_bwd, use_bwd_kernel
    if use_bwd_kernel():
        grads = freq_inter_bwd(y_img, g_eff, wq3, bq3, wk3, bk3, wv3, bv3,
                               wp3, bp, biasB, mask, L, win, itp)
        if grads is not None:
            # the residual passes g straight through: dres = g
            dres = g.astype(res_img.dtype)
            grads = _cast_like(
                (grads[0], dres) + grads[1:],
                (y_img, res_img, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp,
                 biasB))
            return grads + (dmask, ddps)

    diff = (y_img, res_img, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp, biasB)
    rk = _use_fused_bwd()
    _, vjp = jax.vjp(
        lambda *a: _xla_freq_inter(*a, mask, L, win, eps,
                                   route_kernel=rk, interpret=itp), *diff)
    grads = vjp(g_eff)
    if dps is not None:
        # the composite includes the residual, which must see the
        # unscaled cotangent
        grads = (grads[0], g.astype(res_img.dtype)) + grads[2:]
    return grads + (dmask, ddps)


fused_freq_inter.defvjp(_freq_inter_fwd, _freq_inter_bwd)


# ---------------------------------------------------------------------------
# Merged whole-block kernel: attention half + FFN half in ONE pallas_call
# ---------------------------------------------------------------------------
#
# The pair of half-block kernels still round-trips HBM between the halves:
# the attention kernel writes x+attn, the FFN kernel reads it back THREE
# times (prev/cur/next halo BlockSpecs) and writes the block output — six
# tile-volumes of HBM traffic per block plus two kernel dispatches. The
# merged kernel streams each row tile through VMEM once: the attention
# output never touches HBM (it is carried across grid steps in VMEM
# scratch), the FFN conv halo comes from that scratch, and the SW-MSA
# cyclic roll is absorbed into the tile assembly — the kernel consumes the
# TRUE-layout image and produces the TRUE-layout block output, so shifted
# blocks lose their two jnp.roll HBM round-trips as well. Net per block:
# 2 tile-volumes of HBM traffic instead of 6 (8 for shifted blocks) and
# one dispatch instead of two.
#
# Schedule (grid = (B, nI+1), sequential; nI = H/T row tiles):
#   step i < nI : compute a_cur = x + attn(LN1(x)) for ROLLED tile i
#                 (rolled rows [iT, iT+T) = true rows [iT+s, iT+T+s) =
#                 cur_tile[s:] ++ next_tile[:s], next = tile (i+1) % nI,
#                 columns rotated by -s — both as static slice concats).
#   shift s = 0 : step i >= 1 emits TRUE tile i-1: FFN input rows
#                 [jT-1, jT+T] = last_row ++ A_prev ++ a_cur[0:1].
#   shift s > 0 : true row r = rolled row (r - s) mod H; step
#                 1 <= i <= nI-1 emits TRUE tile i from rolled rows
#                 [iT-s-1, iT+T-s] = A_prev[T-s-1:] ++ a_cur[:T-s+1]; the
#                 wrap-around tile 0 (it needs the END of the rolled
#                 image) is emitted at step nI from A_prev (= rolled tile
#                 nI-1) and the stashed rolled tile 0 (f_ref, saved at
#                 step 0).
# Scratch: a_prev [T, W, C] (attn output of the previous rolled tile),
# l1 [1, W, C] (s=0: last attn row of the tile before that), f [T, W, C]
# (s>0: rolled tile 0 for the wrap). All in the model dtype so the merged
# path is numerically identical to the half-kernel pair (which stores the
# intermediate in HBM in model dtype).
#
# Reference behavior being fused: one LeWin block, encoder_Uformer.py:
# 515-682 / decoder_Uformer.py:504-756 (W-MSA/SW-MSA + LeFF).


def use_merged_block() -> bool:
    """Gate for the single-dispatch whole-block kernel (eval path).
    FAIRM_MERGED_BLOCK=0 restores the half-kernel pair for A/B."""
    return (os.environ.get("FAIRM_MERGED_BLOCK", "1")
            not in ("0", "false", "False"))


def merged_block_fits(C: int, Hd: int, itemsize: int, W: int,
                      win: int = 8) -> bool:
    """Whether the merged kernel should take this stage: (a) its
    T-independent VMEM residents (both halves' full-width weights +
    packed bias) leave room for at least a win-row tile of both halves'
    token copies under the 16 MB scoped-VMEM limit — the deepest decoder
    stage (C=896, Hd=3584: 19.2 MB of bf16 weights) cannot; and (b) the
    resolution is high enough for the merged kernel to WIN: on-chip A/B
    (B=32, VALIDATION.md r4) shows 1.24-1.31x at res 128/64 but
    0.81-0.91x at res 32/16, where the combined token budget forces
    win-row tiles — the half-kernel pair with its larger per-half tiles
    stays faster there."""
    min_res = int(os.environ.get("FAIRM_MERGED_MIN_RES", "64"))
    if W < min_res:
        return False
    weights = 4 * C * C * itemsize + 2 * C * Hd * itemsize + 9 * Hd * 4
    t = win
    tokens = 6 * t * W * C * 4 + 3 * (t + 2) * (W + 2) * Hd * 4
    scratch = 4 * t * W * C * itemsize
    return weights + tokens + scratch <= (12 << 20)


def _merged_choose_t(H: int, W: int, C: int, Hd: int, win: int,
                     itemsize: int) -> int:
    """Largest row-tile T (multiple of win, dividing H) whose combined
    attention + FFN fp32 token copies fit the merged budget."""
    budget = _tile_budget(9, "FAIRM_MERGED_T_MB", itemsize)
    t = win
    while (t * 2 <= H and H % (t * 2) == 0
           and (6 * (t * 2) * W * C * 4
                + 3 * (t * 2 + 2) * (W + 2) * Hd * 4) <= budget):
        t *= 2
    return t


def _cols_rot(v, s: int):
    """Static column rotation: out[:, c] = v[:, (c + s) % W] (s may be
    negative). Static slice concat, NOT jnp.roll — Mosaic's rotate lowers
    poorly/fails for 16-bit data on hardware (VALIDATION.md r3, DCN)."""
    W = v.shape[1]
    s = s % W
    if s == 0:
        return v
    return jnp.concatenate([v[:, s:], v[:, :s]], axis=1)


def _merged_kernel(xc_ref, xn_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                   wp_ref, bp_ref, bias_ref, mask_ref, lam_ref, ln2s_ref,
                   ln2b_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref,
                   b2_ref, dps_ref, out_ref, *refs, T: int, W: int, C: int,
                   Hd: int, h: int, win: int, P: int, s: int, nI: int,
                   eps: float, has_mask: bool, has_lam: bool,
                   has_dps: bool, with_u: bool = False, dtype,
                   ldt=jnp.float32):
    if with_u:
        # u: the FFN half's input (attention output + residual, TRUE
        # layout) — emitted for the training backward so _merged_bwd can
        # run the halves' Pallas backward kernels DIRECTLY instead of
        # re-running a full block forward to reconstruct it.
        u_ref, acur_ref, aprev_ref, l1_ref, f_ref = refs
    else:
        u_ref = None
        acur_ref, aprev_ref, l1_ref, f_ref = refs
    # dps_ref: [1, 1, 2] per-image DropPath branch scales — [..., 0] for
    # the attention half, [..., 1] for the FFN half (see fused_block_merged)
    i = pl.program_id(1)
    n = win * win
    nw_tile = (T // win) * (W // win)
    G = nw_tile // P
    d = C // h

    # ---- attention half: rolled tile i, SKIPPED at the extra grid step
    # i == nI (the stale acur_ref content is never consumed where it
    # matters — see the emit assembly below) ---------------------------
    @pl.when(i < nI)
    def _attn_half():
        if s > 0:
            xt = jnp.concatenate([xc_ref[0, s:T], xn_ref[0, :s]], axis=0)
            xt = _cols_rot(xt, s)                    # [T, W, C] rolled
        else:
            xt = xc_ref[0]
        xf = xt.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        xn_ = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn_ = xn_ * ln1s_ref[0] + ln1b_ref[0]

        xw = _win_pack(xn_.astype(dtype), T, W, win, C)  # [M, C]

        qkv = jax.lax.dot_general(
            xw, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bqkv_ref[0]
        qkv = qkv.astype(dtype)                          # [M, 3C]

        group_outs = []
        for g in range(G):
            sl = slice(g * P * n, (g + 1) * P * n)
            head_outs = []
            for hh in range(h):
                q = qkv[sl, hh * d:(hh + 1) * d]
                k = qkv[sl, C + hh * d:C + (hh + 1) * d]
                v = qkv[sl, 2 * C + hh * d:2 * C + (hh + 1) * d]
                # q scale folded into the qkv weights; ldt logits storage
                logits = jax.lax.dot_general(
                    q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(ldt)
                logits = logits + bias_ref[0, hh]
                if has_mask:
                    logits = logits + mask_ref[0, g]
                e = jnp.exp(_softmax_shift(logits))
                og = jax.lax.dot_general(
                    e.astype(dtype), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32
                ) / jnp.sum(e, axis=-1, keepdims=True,
                            dtype=jnp.float32)           # [P*n, d] fp32
                if has_lam:
                    lam = lam_ref[0, 0, hh]
                    vs = jnp.sum(v.astype(jnp.float32).reshape(P, n, d),
                                 axis=1)
                    og = ((1.0 + lam) * og.reshape(P, n, d)
                          - (lam / n) * vs[:, None, :]).reshape(P * n, d)
                head_outs.append(og.astype(dtype))
            group_outs.append(jnp.concatenate(head_outs, axis=1))
        out_all = jnp.concatenate(group_outs, axis=0)    # [M, C]
        br = jax.lax.dot_general(
            out_all, wp_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bp_ref[0]
        if has_dps:
            br = br * dps_ref[0, 0, 0]   # attention-half DropPath scale
        # residual in image layout (saves a packed fp32 [M, C] copy)
        acur_ref[...] = (_win_unpack(br, T, W, win, C)
                         + xf).astype(dtype)

    if s > 0:
        @pl.when(i == 0)
        def _stash_first():
            f_ref[...] = acur_ref[...]

    # ---- FFN emit: true tile j --------------------------------------
    a_cur = acur_ref[...]
    if s == 0:
        # j = i - 1; rows [jT-1, jT+T] = l1 ++ a_prev ++ a_cur[0:1]
        # (a_cur stale at i == nI: it is the bottom IMAGE halo there,
        # zeroed below)
        rows = jnp.concatenate(
            [l1_ref[...], aprev_ref[...], a_cur[0:1]], axis=0)
        j = i - 1
    else:
        # j = i (interior) or 0 (wrap step i == nI); true rows
        # [jT-1, jT+T] = rolled [jT-s-1, jT+T-s] (the interior branch is
        # computed from stale a_cur at i == nI and discarded by the where)
        head = aprev_ref[T - s - 1:T]                # s+1 rows
        interior = jnp.concatenate([head, a_cur[:T - s + 1]], axis=0)
        wrap = jnp.concatenate([head, f_ref[:T - s + 1]], axis=0)
        rows = jnp.where((i == nI), wrap, interior)  # [T+2, W, C]
        rows = _cols_rot(rows, -s)                   # back to true cols
        j = jnp.where(i < nI, i, 0)

    xf2 = rows.astype(jnp.float32)                   # [T+2, W, C]
    mu2 = jnp.mean(xf2, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(xf2 - mu2), axis=-1, keepdims=True)
    xn2 = (xf2 - mu2) * jax.lax.rsqrt(var2 + eps)
    xn2 = (xn2 * ln2s_ref[0] + ln2b_ref[0]).astype(dtype)

    hdn = jax.lax.dot_general(
        xn2.reshape((T + 2) * W, C), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hdn = _gelu(hdn + b1_ref[...]).reshape(T + 2, W, Hd)

    # zero the hidden halo rows at the image boundary (conv zero padding)
    rws = jax.lax.broadcasted_iota(jnp.int32, (T + 2, 1, 1), 0)
    top = jnp.logical_and(j == 0, rws == 0)
    bot = jnp.logical_and(j == nI - 1, rws == T + 1)
    hdn = jnp.where(jnp.logical_or(top, bot), 0.0, hdn)

    zcol = jnp.zeros((T + 2, 1, Hd), jnp.float32)
    hp = jnp.concatenate([zcol, hdn, zcol], axis=1)  # [T+2, W+2, Hd]
    facc = jnp.zeros((T, W, Hd), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy, dx][None, None, :]
            facc = facc + hp[dy:dy + T, dx:dx + W] * tap
    facc = _gelu(facc + bd_ref[...])

    y = jax.lax.dot_general(
        facc.reshape(T * W, Hd).astype(dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2_ref[...]
    if has_dps:
        y = y * dps_ref[0, 0, 1]         # FFN-half DropPath scale
    y = y + rows[1:T + 1].astype(jnp.float32).reshape(T * W, C)

    @pl.when(i >= 1)
    def _emit():
        out_ref[...] = y.reshape(1, T, W, C).astype(out_ref.dtype)
        if with_u:
            u_ref[...] = rows[1:T + 1].reshape(1, T, W, C).astype(
                u_ref.dtype)

    # cycle scratch AFTER the emit assembly consumed it
    @pl.when(i < nI)
    def _cycle():
        if s == 0:
            l1_ref[...] = aprev_ref[T - 1:T]
        aprev_ref[...] = acur_ref[...]


def _merged_forward(x_img, ln1s, ln1b, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                    bp, bias, mask, lam, ln2s, ln2b, w1, b1, wd, bd, w2,
                    b2, win: int, shift: int, eps: float, interpret,
                    dps1=None, dps2=None, with_u: bool = False):
    interpret = _resolve_interpret(interpret)
    B, H, W, C = x_img.shape
    h = wq3.shape[0]
    n = win * win
    Hd = w1.shape[1]
    dt = x_img.dtype
    itemsize = jnp.dtype(dt).itemsize
    T = _merged_choose_t(H, W, C, Hd, win, itemsize)
    nI = H // T
    nw_tile = (T // win) * (W // win)
    s = shift

    pmax = max(1, (128 * int(os.environ.get("FAIRM_ATTN_P", "2"))) // n)
    while pmax > 1 and h * (pmax * n) ** 2 * 4 > (2 << 20):
        pmax //= 2
    P = max(1, min(pmax, nw_tile))
    while nw_tile % P != 0:
        P -= 1
    G = nw_tile // P

    d = C // h
    scale = d ** -0.5
    ldt = dt if (dt == jnp.bfloat16 and _bf16_logits()) else jnp.float32
    wqkv = jnp.concatenate(
        [w.transpose(1, 0, 2).reshape(C, C) for w in
         (wq3 * scale, wk3, wv3)], axis=1).astype(dt)
    bqkv = jnp.concatenate(
        [b.reshape(C) for b in (bq3 * scale, bk3, bv3)]
    ).reshape(1, 3 * C).astype(jnp.float32)
    wp = wp3.reshape(C, C).astype(dt)

    bias_p = (jnp.tile(bias.astype(jnp.float32)[None], (1, 1, P, P))
              + jnp.asarray(_pack_bias_np(P, n))[None, None]).astype(ldt)
    bias_spec = pl.BlockSpec((1, h, P * n, P * n),
                             lambda b, i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)

    has_mask = mask is not None
    if has_mask:
        nW = mask.shape[0]
        assert nW == (H // win) * (W // win)
        m = mask.astype(jnp.float32).reshape(nI, G, P, n, n)
        mp = jnp.zeros((nI, G, P * n, P * n), jnp.float32)
        for p_ in range(P):
            mp = mp.at[:, :, p_ * n:(p_ + 1) * n,
                       p_ * n:(p_ + 1) * n].set(m[:, :, p_])
        mask_arr = mp.astype(ldt)
        mask_spec = pl.BlockSpec(
            (1, G, P * n, P * n),
            lambda b, i: (jnp.minimum(i, nI - 1), 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        mask_arr = jnp.zeros((1, 1, P * n, P * n), ldt)
        mask_spec = pl.BlockSpec((1, 1, P * n, P * n),
                                 lambda b, i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    has_lam = lam is not None
    if has_lam:
        lam_arr = lam.astype(jnp.float32).reshape(B, 1, h)
        lam_spec = pl.BlockSpec((1, 1, h), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        lam_arr = jnp.zeros((1, 1, h), jnp.float32)
        lam_spec = pl.BlockSpec((1, 1, h), lambda b, i: (0, 0, 0),
                                memory_space=pltpu.VMEM)

    has_dps = dps1 is not None
    assert (dps2 is not None) == has_dps, "dps1/dps2 come as a pair"
    if has_dps:
        # [B, 1, 2]: per-image (attn, ffn) DropPath branch scales; the
        # trailing (1, 2) block equals the full array dims
        dps_arr = jnp.stack(
            [dps1.astype(jnp.float32), dps2.astype(jnp.float32)],
            axis=-1).reshape(B, 1, 2)
        dps_spec = pl.BlockSpec((1, 1, 2), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        dps_arr = jnp.ones((1, 1, 2), jnp.float32)
        dps_spec = pl.BlockSpec((1, 1, 2), lambda b, i: (0, 0, 0),
                                memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _merged_kernel, T=T, W=W, C=C, Hd=Hd, h=h, win=win, P=P, s=s,
        nI=nI, eps=eps, has_mask=has_mask, has_lam=has_lam,
        has_dps=has_dps, with_u=with_u, dtype=dt, ldt=ldt)
    vspec = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    xspec_cur = pl.BlockSpec((1, T, W, C),
                             lambda b, i: (b, jnp.minimum(i, nI - 1), 0, 0),
                             memory_space=pltpu.VMEM)
    xspec_next = pl.BlockSpec(
        (1, T, W, C),
        lambda b, i: (b, jax.lax.rem(jnp.minimum(i, nI - 1) + 1, nI), 0, 0),
        memory_space=pltpu.VMEM)
    if s == 0:
        out_map = lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0)
    else:
        out_map = lambda b, i: (b, jnp.where(i < nI, i, 0), 0, 0)

    # the cross-step scratch carry (a_prev/l1/f) requires strictly
    # sequential grid execution. with_u (training): the extra output
    # block pushes the res-128 stages past Mosaic's 16 MiB scoped-VMEM
    # default -> raise the per-kernel cap (v5e: 128 MiB VMEM/core).
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        **({"vmem_limit_bytes": (48 << 20)} if with_u else {}))

    tile_spec = pl.BlockSpec((1, T, W, C), out_map,
                             memory_space=pltpu.VMEM)
    out_specs = [tile_spec] * 2 if with_u else tile_spec
    out_shape = jax.ShapeDtypeStruct((B, H, W, C), dt)
    if with_u:
        out_shape = [out_shape, out_shape]

    return pl.pallas_call(
        kernel,
        grid=(B, nI + 1),
        in_specs=[
            xspec_cur, xspec_next,
            vspec(1, C), vspec(1, C),                          # ln1
            vspec(C, 3 * C), vspec(1, 3 * C),                  # qkv
            vspec(C, C), vspec(1, C),                          # proj
            bias_spec, mask_spec, lam_spec,
            vspec(1, C), vspec(1, C),                          # ln2
            vspec(C, Hd), vspec(Hd), vspec(3, 3, Hd), vspec(Hd),
            vspec(Hd, C), vspec(C),
            dps_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((T, W, C), dt),                         # a_cur
            pltpu.VMEM((T, W, C), dt),                         # a_prev
            pltpu.VMEM((1, W, C), dt),                         # l1
            pltpu.VMEM((T, W, C), dt),                         # f
        ],
        compiler_params=cparams,
        interpret=interpret,
    )(x_img, x_img, ln1s.reshape(1, C), ln1b.reshape(1, C),
      wqkv, bqkv, wp, bp.reshape(1, C), bias_p, mask_arr, lam_arr,
      ln2s.reshape(1, C), ln2b.reshape(1, C),
      w1.astype(dt), b1.astype(jnp.float32), wd.astype(jnp.float32),
      bd.astype(jnp.float32), w2.astype(dt), b2.astype(jnp.float32),
      dps_arr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(22, 23, 24, 25))
def fused_block_merged(x_img, ln1s, ln1b, wq3, bq3, wk3, bk3, wv3, bv3,
                       wp3, bp, bias, mask, lam, ln2s, ln2b, w1, b1, wd,
                       bd, w2, b2, win: int = 8, shift: int = 0,
                       eps: float = 1e-6, interpret=None, dps1=None,
                       dps2=None):
    """One whole LeWin block — ``u = x + dps1 * proj(win_attn(LN1(x)));
    out = u + dps2 * LeFF(LN2(u))`` — in a single pallas_call, on the
    TRUE-layout image (the SW-MSA roll for ``shift > 0`` is absorbed into
    the kernel's tile assembly). Numerically identical to
    ``fused_block_ffn(roll_back(fused_block_attention(roll(x))))``.

    ``dps1``/``dps2``: optional ``[B]`` per-image DropPath branch scales
    (values {0, 1/keep}, both given or both None) — stochastic depth
    applied in-kernel, so TRAINING can use the single-dispatch block too
    (r4; previously DropPath's external lerp forced the half-kernel
    pair). The VJP chains the two fused halves' custom VJPs, so the
    backward runs the dedicated Pallas backward kernels
    (ops/pallas/lewin_block_bwd.py) exactly like the pair path."""
    impl = lambda *a: _merged_forward(*a[:22], win, shift, eps, interpret,
                                      dps1=a[22], dps2=a[23])
    return _spmd_call(
        impl,
        [(x_img, 0), (ln1s, None), (ln1b, None), (wq3, None), (bq3, None),
         (wk3, None), (bk3, None), (wv3, None), (bv3, None), (wp3, None),
         (bp, None), (bias, None), (mask, None), (lam, 0),
         (ln2s, None), (ln2b, None), (w1, None), (b1, None), (wd, None),
         (bd, None), (w2, None), (b2, None), (dps1, 0), (dps2, 0)])


def _merged_fwd(x_img, ln1s, ln1b, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp,
                bias, mask, lam, ln2s, ln2b, w1, b1, wd, bd, w2, b2, win,
                shift, eps, interpret, dps1, dps2):
    # with_u: emit the FFN half's input alongside the block output (one
    # extra [B, H, W, C] save per block) so the backward can run the two
    # Pallas backward kernels DIRECTLY — no block-forward re-run. The
    # training backward previously paid a full extra forward per block
    # (jax.vjp over the half-kernel pair) just to rebuild u; measured on
    # v5e that re-forward was the largest single slice of the 518 ms
    # B=32 joint backward (VALIDATION.md r5).
    out, u = _merged_forward(x_img, ln1s, ln1b, wq3, bq3, wk3, bk3, wv3,
                             bv3, wp3, bp, bias, mask, lam, ln2s, ln2b,
                             w1, b1, wd, bd, w2, b2, win, shift, eps,
                             interpret, dps1, dps2, with_u=True)
    return out, (x_img, u, ln1s, ln1b, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                 bp, bias, mask, lam, ln2s, ln2b, w1, b1, wd, bd, w2, b2,
                 dps1, dps2)


def _merged_bwd(win, shift, eps, interpret, res, g):
    (x_img, u, ln1s, ln1b, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp, bias,
     mask, lam, ln2s, ln2b, w1, b1, wd, bd, w2, b2, dps1, dps2) = res
    dmask = None if mask is None else jnp.zeros_like(mask)
    ddps1 = None if dps1 is None else jnp.zeros_like(dps1)
    ddps2 = None if dps2 is None else jnp.zeros_like(dps2)

    # Direct chain of the halves' backward rules on the SAVED u — the
    # numerics are identical to differentiating the half-kernel pair
    # (u is the exact dtype-dt value the pair materializes), with zero
    # forward recompute. Rolls are permutations: d(roll)^T = roll back.
    gf = _ffn_bwd(eps, interpret,
                  (u, ln2s, ln2b, w1, b1, wd, bd, w2, b2, dps2), g)
    du = gf[0]
    gu = du if shift == 0 else jnp.roll(du, (-shift, -shift), axis=(1, 2))
    img = (x_img if shift == 0
           else jnp.roll(x_img, (-shift, -shift), axis=(1, 2)))
    ga = _attn_bwd(win, eps, interpret,
                   (img, ln1s, ln1b, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                    bp, bias, mask, lam, dps1), gu)
    dx = (ga[0] if shift == 0
          else jnp.roll(ga[0], (shift, shift), axis=(1, 2)))
    # ga: (dx, dln1s, dln1b, dwq3.. dbp, dbias, dmask, dlam, ddps)
    return ((dx,) + ga[1:12] + (dmask, ga[13])
            + gf[1:9] + (ddps1, ddps2))


fused_block_merged.defvjp(_merged_fwd, _merged_bwd)


# ---------------------------------------------------------------------------
# Merged frequency-MSA block: intra + inter + FFN in ONE pallas_call
# ---------------------------------------------------------------------------
#
# The encoder's frequency-MSA LeWin block ran THREE dispatches per block
# (fused_freq_intra -> fused_freq_inter -> fused_block_ffn) with two HBM
# round-trips of the [L*B, H, W, C] activations between them. This merges
# the whole block the same way fused_block_merged merges the origin-MSA
# block: the MSA output (intra per-band attention, then the grouped
# cross-band inter attention, residual added) crosses grid steps in VMEM
# scratch, the FFN consumes its row halo from that scratch, and the SW-MSA
# roll is absorbed into the tile assembly. Numerically identical to the
# three-dispatch chain (which stores intermediates in HBM in model dtype).
#
# Reference behavior being fused: one frequency-MSA LeWin block,
# encoder_Uformer.py:515-682 with the intra->inter chain of :558-572.


def use_merged_freq() -> bool:
    """Gate for the single-dispatch frequency-MSA block kernel.
    FAIRM_MERGED_FREQ=0 restores the three-dispatch chain for A/B."""
    return (os.environ.get("FAIRM_MERGED_FREQ", "1")
            not in ("0", "false", "False"))


def _merged_freq_tokens(L: int, T: int, W: int, C: int, Hd: int) -> int:
    """fp32 token-copy estimate for one grid step of the merged freq
    kernel: both attention halves' packed copies + the FFN hidden chain,
    all carrying the L band dim, plus the inter half's grouped-window
    qkv buffer."""
    attn = 6 * T * W * C * 4 * L
    ffn = 3 * (T + 2) * (W + 2) * Hd * 4 * L
    nw = (T // 8) * (W // 8) if W >= 8 else 1
    inter = nw * (L * 64) * 4 * C * 4            # z + qkvB (fp32-ish)
    return attn + ffn + inter


def merged_freq_fits(C: int, Hd: int, L: int, itemsize: int, W: int,
                     win: int = 8) -> bool:
    """Whether the merged freq kernel should take this stage: both MSA
    halves' and the FFN's full-width weights plus a win-row tile of the
    L-banded token copies must fit scoped VMEM next to the [L, T, W, C]
    scratch carries. Resolution gates from on-chip A/B (v5e, B=8, L=3,
    tools/op_bench.py freqmerged): the merged kernel wins 1.6-2.1x at
    res <= 32 (one grid step holds the whole image; merging removes the
    chain's dispatch + HBM round-trips, which dominate there) but LOSES
    0.82-0.85x at res 64/128, where the L-banded token budget forces
    win-row tiles and the chain's larger per-half tiles stay faster —
    the mirror image of the origin-MSA merged kernel's res gate
    (merged_block_fits). Default: merged only at res <= 32."""
    min_res = int(os.environ.get("FAIRM_MERGED_FREQ_MIN_RES", "0"))
    max_res = int(os.environ.get("FAIRM_MERGED_FREQ_MAX_RES", "32"))
    if W < min_res or W > max_res:
        return False
    # two attention weight sets (intra + inter qkv/proj) + FFN weights
    weights = 8 * C * C * itemsize + 2 * C * Hd * itemsize + 9 * Hd * 4
    tokens = _merged_freq_tokens(L, win, W, C, Hd)
    scratch = 4 * L * win * W * C * itemsize
    return weights + tokens + scratch <= (12 << 20)


def _merged_freq_choose_t(H: int, W: int, C: int, Hd: int, L: int,
                          win: int, itemsize: int) -> int:
    budget = _tile_budget(9, "FAIRM_MERGED_T_MB", itemsize)
    t = win
    while (t * 2 <= H and H % (t * 2) == 0
           and _merged_freq_tokens(L, t * 2, W, C, Hd) <= budget):
        t *= 2
    return t


def _merged_freq_kernel(xc_ref, xn_ref, ln1s_ref, ln1b_ref,
                        wqkvA_ref, bqkvA_ref, wpA_ref, bpA_ref, biasA_ref,
                        wqkvB_ref, bqkvB_ref, wpB_ref, bpB_ref, biasB_ref,
                        maskA_ref, maskI_ref, ln2s_ref, ln2b_ref,
                        w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref,
                        dps_ref, out_ref, *refs, L: int, T: int, W: int,
                        C: int, Hd: int, h: int, win: int, P: int, s: int,
                        nI: int, eps: float, has_mask: bool,
                        has_dps: bool, with_aux: bool = False, dtype,
                        ldt=jnp.float32):
    if with_aux:
        # training-backward saves: u = the FFN half's input (TRUE
        # layout) and y1 = the intra half's output (rolled layout) —
        # exactly the two intermediates the chain path materializes, so
        # _freq_merged_bwd can run the three Pallas backward kernels
        # directly with zero forward recompute.
        u_ref, y1_ref, acur_ref, aprev_ref, l1_ref, f_ref = refs
    else:
        u_ref = y1_ref = None
        acur_ref, aprev_ref, l1_ref, f_ref = refs
    # dps_ref: [1, L, 2] per-image-per-band DropPath branch scales —
    # [0, l, 0] scales the whole intra+inter MSA branch of band l,
    # [0, l, 1] the FFN branch (see fused_block_freq_merged)
    i = pl.program_id(1)
    n = win * win
    Ln = L * n
    nw_tile = (T // win) * (W // win)
    G = nw_tile // P
    d = C // h

    # ---- MSA half: rolled tile i (skipped at the extra grid step) ----
    @pl.when(i < nI)
    def _msa_half():
        if s > 0:
            xt = jnp.concatenate([xc_ref[:, 0, s:T], xn_ref[:, 0, :s]],
                                 axis=1)             # [L, T, W, C]
            xt = jnp.concatenate([xt[:, :, s:], xt[:, :, :s]], axis=2)
        else:
            xt = xc_ref[:, 0]
        xf = xt.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        xn_ = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn_ = xn_ * ln1s_ref[0] + ln1b_ref[0]

        # -- intra: per-band windowed attention, NO residual ----------
        # window-major tokens per band: [L, M, C]
        xw = jnp.stack([_win_pack(xn_[l].astype(dtype), T, W, win, C)
                        for l in range(L)], axis=0)
        qkv = jax.lax.dot_general(
            xw.reshape(L * nw_tile * n, C), wqkvA_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bqkvA_ref[0]
        qkv = qkv.astype(dtype).reshape(L, nw_tile * n, 3 * C)

        band_outs = []
        for l in range(L):
            group_outs = []
            for g in range(G):
                sl = slice(g * P * n, (g + 1) * P * n)
                head_outs = []
                for hh in range(h):
                    q = qkv[l, sl, hh * d:(hh + 1) * d]
                    k = qkv[l, sl, C + hh * d:C + (hh + 1) * d]
                    v = qkv[l, sl, 2 * C + hh * d:2 * C + (hh + 1) * d]
                    logits = jax.lax.dot_general(
                        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(ldt)
                    logits = logits + biasA_ref[l, hh]
                    if has_mask:
                        logits = logits + maskA_ref[0, g]
                    e = jnp.exp(_softmax_shift(logits))
                    head_outs.append((jax.lax.dot_general(
                        e.astype(dtype), v,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                        / jnp.sum(e, axis=-1, keepdims=True,
                                  dtype=jnp.float32)).astype(dtype))
                group_outs.append(jnp.concatenate(head_outs, axis=1))
            band_outs.append(jnp.concatenate(group_outs, axis=0))
        y1 = jnp.stack(band_outs, axis=0)            # [L, M, C] attn out
        y1 = jax.lax.dot_general(
            y1.reshape(L * nw_tile * n, C), wpA_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bpA_ref[0]

        if with_aux:
            # intra output for rolled tile i (dtype cast = the exact
            # value the inter half consumes / the chain materializes)
            y1r = y1.astype(dtype).reshape(L, nw_tile * n, C)
            y1_ref[...] = jnp.stack(
                [_win_unpack(y1r[l], T, W, win, C) for l in range(L)],
                axis=0).reshape(L, 1, T, W, C)

        # -- inter: window-grouped cross-band attention + residual ----
        # [L, nw, n, C] -> [nw, L*n, C]
        z = (y1.astype(dtype).reshape(L, nw_tile, n, C)
               .transpose(1, 0, 2, 3).reshape(nw_tile * Ln, C))
        qkvB = jax.lax.dot_general(
            z, wqkvB_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bqkvB_ref[0]
        qkvB = qkvB.astype(dtype)

        win_outs = []
        for j in range(nw_tile):
            sl = slice(j * Ln, (j + 1) * Ln)
            mtile = (jnp.tile(maskI_ref[0, j], (L, L)) if has_mask
                     else None)
            head_outs = []
            for hh in range(h):
                q = qkvB[sl, hh * d:(hh + 1) * d]
                k = qkvB[sl, C + hh * d:C + (hh + 1) * d]
                v = qkvB[sl, 2 * C + hh * d:2 * C + (hh + 1) * d]
                logits = jax.lax.dot_general(
                    q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(ldt)
                logits = logits + biasB_ref[hh]
                if has_mask:
                    logits = logits + mtile
                e = jnp.exp(_softmax_shift(logits))
                head_outs.append((jax.lax.dot_general(
                    e.astype(dtype), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    / jnp.sum(e, axis=-1, keepdims=True,
                              dtype=jnp.float32)).astype(dtype))
            win_outs.append(jnp.concatenate(head_outs, axis=1))
        outB = jnp.concatenate(win_outs, axis=0)     # [nw*Ln, C]
        acc = jax.lax.dot_general(
            outB, wpB_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bpB_ref[0]

        # band-major + per-band DropPath scale + residual (rolled layout)
        accb = (acc.reshape(nw_tile, L, n, C).transpose(1, 0, 2, 3)
                   .reshape(L, nw_tile * n, C))
        outs = []
        for l in range(L):
            br = _win_unpack(accb[l], T, W, win, C)
            if has_dps:
                br = br * dps_ref[0, l, 0]
            outs.append(br + xf[l])
        acur_ref[...] = jnp.stack(outs, axis=0).astype(dtype)

    if s > 0:
        @pl.when(i == 0)
        def _stash_first():
            f_ref[...] = acur_ref[...]

    # ---- FFN emit: true tile j (identical to _merged_kernel, with the
    # band dim along axis 0) -------------------------------------------
    a_cur = acur_ref[...]
    if s == 0:
        rows = jnp.concatenate(
            [l1_ref[...], aprev_ref[...], a_cur[:, 0:1]], axis=1)
        j = i - 1
    else:
        head = aprev_ref[:, T - s - 1:T]             # [L, s+1, W, C]
        interior = jnp.concatenate([head, a_cur[:, :T - s + 1]], axis=1)
        wrap = jnp.concatenate([head, f_ref[:, :T - s + 1]], axis=1)
        rows = jnp.where((i == nI), wrap, interior)  # [L, T+2, W, C]
        rows = jnp.concatenate(
            [rows[:, :, W - s:], rows[:, :, :W - s]], axis=2)
        j = jnp.where(i < nI, i, 0)

    xf2 = rows.astype(jnp.float32)                   # [L, T+2, W, C]
    mu2 = jnp.mean(xf2, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(xf2 - mu2), axis=-1, keepdims=True)
    xn2 = (xf2 - mu2) * jax.lax.rsqrt(var2 + eps)
    xn2 = (xn2 * ln2s_ref[0] + ln2b_ref[0]).astype(dtype)

    hdn = jax.lax.dot_general(
        xn2.reshape(L * (T + 2) * W, C), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hdn = _gelu(hdn + b1_ref[...]).reshape(L, T + 2, W, Hd)

    rws = jax.lax.broadcasted_iota(jnp.int32, (1, T + 2, 1, 1), 1)
    top = jnp.logical_and(j == 0, rws == 0)
    bot = jnp.logical_and(j == nI - 1, rws == T + 1)
    hdn = jnp.where(jnp.logical_or(top, bot), 0.0, hdn)

    zcol = jnp.zeros((L, T + 2, 1, Hd), jnp.float32)
    hp = jnp.concatenate([zcol, hdn, zcol], axis=2)  # [L, T+2, W+2, Hd]
    facc = jnp.zeros((L, T, W, Hd), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy, dx][None, None, None, :]
            facc = facc + hp[:, dy:dy + T, dx:dx + W] * tap
    facc = _gelu(facc + bd_ref[...])

    y = jax.lax.dot_general(
        facc.reshape(L * T * W, Hd).astype(dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = (y + b2_ref[...]).reshape(L, T, W, C)
    if has_dps:
        y = y * dps_ref[0, :, 1].reshape(L, 1, 1, 1)
    y = y + rows[:, 1:T + 1].astype(jnp.float32)

    @pl.when(i >= 1)
    def _emit():
        out_ref[...] = y.reshape(L, 1, T, W, C).astype(out_ref.dtype)
        if with_aux:
            u_ref[...] = rows[:, 1:T + 1].reshape(L, 1, T, W, C).astype(
                u_ref.dtype)

    @pl.when(i < nI)
    def _cycle():
        if s == 0:
            l1_ref[...] = aprev_ref[:, T - 1:T]
        aprev_ref[...] = acur_ref[...]


def _merged_freq_forward(x_img, ln1s, ln1b, wq3A, bq3A, wk3A, bk3A, wv3A,
                         bv3A, wp3A, bpA, biasA, wq3B, bq3B, wk3B, bk3B,
                         wv3B, bv3B, wp3B, bpB, biasB, mask, ln2s, ln2b,
                         w1, b1, wd, bd, w2, b2, L: int, win: int,
                         shift: int, eps: float, interpret, dps1=None,
                         dps2=None, with_aux: bool = False):
    interpret = _resolve_interpret(interpret)
    LB, H, W, C = x_img.shape
    B = LB // L
    h = wq3A.shape[0]
    n = win * win
    Ln = L * n
    Hd = w1.shape[1]
    dt = x_img.dtype
    itemsize = jnp.dtype(dt).itemsize
    T = _merged_freq_choose_t(H, W, C, Hd, L, win, itemsize)
    nI = H // T
    nw_tile = (T // win) * (W // win)
    s = shift

    pmax = max(1, (128 * int(os.environ.get("FAIRM_ATTN_P", "2"))) // n)
    while pmax > 1 and h * (pmax * n) ** 2 * 4 > (2 << 20):
        pmax //= 2
    P = max(1, min(pmax, nw_tile))
    while nw_tile % P != 0:
        P -= 1
    G = nw_tile // P

    d = C // h
    scale = d ** -0.5
    ldt = dt if (dt == jnp.bfloat16 and _bf16_logits()) else jnp.float32

    def _wqkv(wq3, bq3, wk3, bk3, wv3, bv3):
        w = jnp.concatenate(
            [w_.transpose(1, 0, 2).reshape(C, C) for w_ in
             (wq3 * scale, wk3, wv3)], axis=1).astype(dt)
        b = jnp.concatenate(
            [b_.reshape(C) for b_ in (bq3 * scale, bk3, bv3)]
        ).reshape(1, 3 * C).astype(jnp.float32)
        return w, b

    wqkvA, bqkvA = _wqkv(wq3A, bq3A, wk3A, bk3A, wv3A, bv3A)
    wqkvB, bqkvB = _wqkv(wq3B, bq3B, wk3B, bk3B, wv3B, bv3B)
    wpA = wp3A.reshape(C, C).astype(dt)
    wpB = wp3B.reshape(C, C).astype(dt)

    # intra per-band packed bias [L, h, P*n, P*n]
    biasA_p = (jnp.tile(biasA.astype(jnp.float32), (1, 1, P, P))
               + jnp.asarray(_pack_bias_np(P, n))[None, None]).astype(ldt)

    has_mask = mask is not None
    if has_mask:
        nW = mask.shape[0]
        assert nW == (H // win) * (W // win)
        m = mask.astype(jnp.float32).reshape(nI, G, P, n, n)
        mp = jnp.zeros((nI, G, P * n, P * n), jnp.float32)
        for p_ in range(P):
            mp = mp.at[:, :, p_ * n:(p_ + 1) * n,
                       p_ * n:(p_ + 1) * n].set(m[:, :, p_])
        maskA_arr = mp.astype(ldt)
        maskA_spec = pl.BlockSpec(
            (1, G, P * n, P * n),
            lambda b, i: (jnp.minimum(i, nI - 1), 0, 0, 0),
            memory_space=pltpu.VMEM)
        maskI_arr = mask.astype(ldt).reshape(nI, nw_tile, n, n)
        maskI_spec = pl.BlockSpec(
            (1, nw_tile, n, n),
            lambda b, i: (jnp.minimum(i, nI - 1), 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        maskA_arr = jnp.zeros((1, 1, P * n, P * n), ldt)
        maskA_spec = pl.BlockSpec((1, 1, P * n, P * n),
                                  lambda b, i: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        maskI_arr = jnp.zeros((1, 1, n, n), ldt)
        maskI_spec = pl.BlockSpec((1, 1, n, n), lambda b, i: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)

    has_dps = dps1 is not None
    assert (dps2 is not None) == has_dps, "dps1/dps2 come as a pair"
    if has_dps:
        # [B, L, 2]: per-image-per-band (msa, ffn) branch scales; dps
        # arrive band-major [L*B]
        dps_arr = jnp.stack(
            [dps1.astype(jnp.float32).reshape(L, B).T,
             dps2.astype(jnp.float32).reshape(L, B).T], axis=-1)
        dps_spec = pl.BlockSpec((1, L, 2), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        dps_arr = jnp.ones((1, L, 2), jnp.float32)
        dps_spec = pl.BlockSpec((1, L, 2), lambda b, i: (0, 0, 0),
                                memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _merged_freq_kernel, L=L, T=T, W=W, C=C, Hd=Hd, h=h, win=win,
        P=P, s=s, nI=nI, eps=eps, has_mask=has_mask, has_dps=has_dps,
        with_aux=with_aux, dtype=dt, ldt=ldt)
    vspec = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    x5 = x_img.reshape(L, B, H, W, C)
    xspec_cur = pl.BlockSpec(
        (L, 1, T, W, C),
        lambda b, i: (0, b, jnp.minimum(i, nI - 1), 0, 0),
        memory_space=pltpu.VMEM)
    xspec_next = pl.BlockSpec(
        (L, 1, T, W, C),
        lambda b, i: (0, b, jax.lax.rem(jnp.minimum(i, nI - 1) + 1, nI),
                      0, 0),
        memory_space=pltpu.VMEM)
    if s == 0:
        out_map = lambda b, i: (0, b, jnp.maximum(i - 1, 0), 0, 0)
    else:
        out_map = lambda b, i: (0, b, jnp.where(i < nI, i, 0), 0, 0)

    # The L-banded tile set exceeds Mosaic's 16 MiB scoped-VMEM default at
    # the res-128 stage (measured 16.59 MiB on v5e — interpret mode never
    # sees this); raise the per-kernel cap. v5e has 128 MiB VMEM/core, and
    # the row-tile chooser keeps the working set a small multiple of the
    # budget model, so 48 MiB leaves pipelining headroom.
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=(48 << 20))

    out_spec = pl.BlockSpec((L, 1, T, W, C), out_map,
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((L, B, H, W, C), dt)
    if with_aux:
        # u follows the block output's map (TRUE layout); y1 is written
        # during the MSA half at rolled tile i
        y1_spec = pl.BlockSpec(
            (L, 1, T, W, C),
            lambda b, i: (0, b, jnp.minimum(i, nI - 1), 0, 0),
            memory_space=pltpu.VMEM)
        out_specs = [out_spec, out_spec, y1_spec]
        out_shapes = [out_shape, out_shape, out_shape]
    else:
        out_specs, out_shapes = out_spec, out_shape

    out = pl.pallas_call(
        kernel,
        grid=(B, nI + 1),
        in_specs=[
            xspec_cur, xspec_next,
            vspec(1, C), vspec(1, C),                          # ln1
            vspec(C, 3 * C), vspec(1, 3 * C),                  # qkv A
            vspec(C, C), vspec(1, C),                          # proj A
            vspec(L, h, P * n, P * n),                         # biasA
            vspec(C, 3 * C), vspec(1, 3 * C),                  # qkv B
            vspec(C, C), vspec(1, C),                          # proj B
            vspec(h, Ln, Ln),                                  # biasB
            maskA_spec, maskI_spec,
            vspec(1, C), vspec(1, C),                          # ln2
            vspec(C, Hd), vspec(Hd), vspec(3, 3, Hd), vspec(Hd),
            vspec(Hd, C), vspec(C),
            dps_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((L, T, W, C), dt),                      # a_cur
            pltpu.VMEM((L, T, W, C), dt),                      # a_prev
            pltpu.VMEM((L, 1, W, C), dt),                      # l1
            pltpu.VMEM((L, T, W, C), dt),                      # f
        ],
        compiler_params=cparams,
        interpret=interpret,
    )(x5, x5, ln1s.reshape(1, C), ln1b.reshape(1, C),
      wqkvA, bqkvA, wpA, bpA.reshape(1, C), biasA_p,
      wqkvB, bqkvB, wpB, bpB.reshape(1, C), biasB.astype(ldt),
      maskA_arr, maskI_arr,
      ln2s.reshape(1, C), ln2b.reshape(1, C),
      w1.astype(dt), b1.astype(jnp.float32), wd.astype(jnp.float32),
      bd.astype(jnp.float32), w2.astype(dt), b2.astype(jnp.float32),
      dps_arr)
    if with_aux:
        return tuple(o.reshape(LB, H, W, C) for o in out)
    return out.reshape(LB, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(30, 31, 32, 33, 34))
def fused_block_freq_merged(x_img, ln1s, ln1b, wq3A, bq3A, wk3A, bk3A,
                            wv3A, bv3A, wp3A, bpA, biasA, wq3B, bq3B,
                            wk3B, bk3B, wv3B, bv3B, wp3B, bpB, biasB,
                            mask, ln2s, ln2b, w1, b1, wd, bd, w2, b2,
                            L: int = 1, win: int = 8, shift: int = 0,
                            eps: float = 1e-6, interpret=None, dps1=None,
                            dps2=None):
    """One whole frequency-MSA LeWin block —
    ``u = x + dps1 * inter(intra(LN1(x))); out = u + dps2 * LeFF(LN2(u))``
    — in a single pallas_call on the TRUE-layout band-folded image
    ``[L*B, H, W, C]`` (the SW-MSA roll for ``shift > 0`` is absorbed
    into the tile assembly). Numerically identical to the three-dispatch
    chain ``fused_block_ffn(roll_back(fused_freq_inter(fused_freq_intra(
    roll(x)), roll(x))))``.

    ``biasA``: ``[L, h, n, n]`` per-band diagonal tables; ``biasB``:
    ``[h, L*n, L*n]`` grouped tables with the inter band mask folded in
    (models/uformer_blocks._FusedFreqAttnParams). ``dps1``/``dps2``:
    optional ``[L*B]`` per-folded-sample DropPath branch scales. The VJP
    chains the three underlying custom VJPs, so the backward runs the
    dedicated Pallas backward kernels exactly like the chain path."""
    impl = lambda *a: _merged_freq_forward(*a[:30], L, win, shift, eps,
                                           interpret, dps1=a[30],
                                           dps2=a[31])
    return impl(x_img, ln1s, ln1b, wq3A, bq3A, wk3A, bk3A, wv3A, bv3A,
                wp3A, bpA, biasA, wq3B, bq3B, wk3B, bk3B, wv3B, bv3B,
                wp3B, bpB, biasB, mask, ln2s, ln2b, w1, b1, wd, bd, w2,
                b2, dps1, dps2)


def _freq_merged_fwd(x_img, ln1s, ln1b, wq3A, bq3A, wk3A, bk3A, wv3A,
                     bv3A, wp3A, bpA, biasA, wq3B, bq3B, wk3B, bk3B,
                     wv3B, bv3B, wp3B, bpB, biasB, mask, ln2s, ln2b, w1,
                     b1, wd, bd, w2, b2, L, win, shift, eps, interpret,
                     dps1, dps2):
    # with_aux: emit u (FFN input) + y1 (intra output) so the backward
    # runs the three Pallas backward kernels directly — no forward
    # recompute (see _merged_fwd).
    out, u, y1 = _merged_freq_forward(
        x_img, ln1s, ln1b, wq3A, bq3A, wk3A, bk3A, wv3A, bv3A, wp3A, bpA,
        biasA, wq3B, bq3B, wk3B, bk3B, wv3B, bv3B, wp3B, bpB, biasB,
        mask, ln2s, ln2b, w1, b1, wd, bd, w2, b2, L, win, shift, eps,
        interpret, dps1, dps2, with_aux=True)
    return out, (x_img, u, y1, ln1s, ln1b, wq3A, bq3A, wk3A, bk3A, wv3A,
                 bv3A, wp3A, bpA, biasA, wq3B, bq3B, wk3B, bk3B, wv3B,
                 bv3B, wp3B, bpB, biasB, mask, ln2s, ln2b, w1, b1, wd,
                 bd, w2, b2, dps1, dps2)


def _freq_merged_bwd(L, win, shift, eps, interpret, res, g):
    (x_img, u, y1, ln1s, ln1b, wq3A, bq3A, wk3A, bk3A, wv3A, bv3A, wp3A,
     bpA, biasA, wq3B, bq3B, wk3B, bk3B, wv3B, bv3B, wp3B, bpB, biasB,
     mask, ln2s, ln2b, w1, b1, wd, bd, w2, b2, dps1, dps2) = res
    dmask = None if mask is None else jnp.zeros_like(mask)
    ddps1 = None if dps1 is None else jnp.zeros_like(dps1)
    ddps2 = None if dps2 is None else jnp.zeros_like(dps2)

    # Direct chain of the three halves' backward rules on the SAVED
    # intermediates (u: FFN input, TRUE layout; y1: intra output, rolled
    # layout) — numerically identical to differentiating the dispatch
    # chain, with zero forward recompute.
    gf = _ffn_bwd(eps, interpret,
                  (u, ln2s, ln2b, w1, b1, wd, bd, w2, b2, dps2), g)
    du = gf[0]
    gy = du if shift == 0 else jnp.roll(du, (-shift, -shift), axis=(1, 2))
    img = (x_img if shift == 0
           else jnp.roll(x_img, (-shift, -shift), axis=(1, 2)))
    gi = _freq_inter_bwd(L, win, eps, interpret,
                         (y1, img, wq3B, bq3B, wk3B, bk3B, wv3B, bv3B,
                          wp3B, bpB, biasB, mask, dps1), gy)
    ga = _freq_intra_bwd(L, win, eps, interpret,
                         (img, ln1s, ln1b, wq3A, bq3A, wk3A, bk3A, wv3A,
                          bv3A, wp3A, bpA, biasA, mask), gi[0])
    dimg = ga[0] + gi[1]              # intra input + inter residual
    dx = (dimg if shift == 0
          else jnp.roll(dimg, (shift, shift), axis=(1, 2)))
    # ga: (dimg, dln1s, dln1b, dwq3A.. dbpA, dbiasA, dmask)
    # gi: (dy1, dres, dwq3B.. dbpB, dbiasB, dmask, ddps)
    return ((dx,) + ga[1:12] + gi[2:11] + (dmask,)
            + gf[1:9] + (ddps1, ddps2))


fused_block_freq_merged.defvjp(_freq_merged_fwd, _freq_merged_bwd)
