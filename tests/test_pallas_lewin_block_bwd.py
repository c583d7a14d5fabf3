"""Fused Pallas backward kernels (ops/pallas/lewin_block_bwd.py) vs the
XLA-recompute backward, interpret mode on CPU: every differentiable
argument's gradient, including the grid-accumulated weight/bias grads,
with the row-tile budgets forced small so the multi-tile halo and
revisited-accumulator paths are exercised."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu.ops.pallas import (
    lewin_block as lb)
from frequency_wised_all_in_one_image_restoration_model_tpu.ops.pallas import (
    lewin_block_bwd as lbb)
from frequency_wised_all_in_one_image_restoration_model_tpu.ops import (
    windows as win_ops)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _mk(rng):
    return lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))


def _grads_both_paths(monkeypatch, loss, args):
    """jax.grad over every arg, kernel backward vs XLA-recompute
    backward. FAIRM_FUSED_BWD=0 in the reference branch keeps it a pure
    jax.vjp of the unfused composite."""
    monkeypatch.setenv("FAIRM_BWD_KERNEL", "0")
    monkeypatch.setenv("FAIRM_FUSED_BWD", "0")
    g_ref = jax.grad(loss, argnums=tuple(range(len(args))))(*args)
    monkeypatch.setenv("FAIRM_BWD_KERNEL", "1")
    g_ker = jax.grad(loss, argnums=tuple(range(len(args))))(*args)
    return g_ref, g_ker


def _assert_close(g_ref, g_ker, tol=2e-4):
    for i, (a, b) in enumerate(zip(g_ref, g_ker)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=tol, atol=tol,
            err_msg=f"grad #{i}")


def _attn_args(rng, B, H, W, C, h, win):
    mk = _mk(rng)
    d = C // h
    n = win * win
    x = mk(B, H, W, C) * 0.5
    lns, lnb = 1.0 + 0.1 * mk(C), 0.1 * mk(C)
    wq3, wk3, wv3 = (mk(h, C, d) * 0.2 for _ in range(3))
    bq3, bk3, bv3 = (mk(h, d) * 0.1 for _ in range(3))
    wp3, bp = mk(h, d, C) * 0.2, mk(C) * 0.1
    bias = mk(h, n, n) * 0.05
    return (x, lns, lnb, wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp, bias)


def test_attn_bwd_kernel_all_grads_multi_tile(rng, monkeypatch):
    """Attention-half backward kernel on the hard grid: SW-MSA shift mask
    + all_DC lam, forced T=win so nI=4 row tiles revisit the weight-grad
    accumulators, every one of the 13 diff args checked."""
    monkeypatch.setenv("FAIRM_ATTN_BWD_T_MB", "0")
    B, H, W, C, h, win = 2, 32, 32, 8, 2, 8
    args = _attn_args(rng, B, H, W, C, h, win)
    mask = jnp.asarray(win_ops.shift_attn_mask(H, W, win, win // 2))
    lam = _mk(rng)(B, h) * 0.3
    args = args + (lam,)

    def loss(*a):
        return jnp.sum(lb.fused_block_attention(
            *a[:12], mask, a[12], win, 1e-6, True) ** 2)

    g_ref, g_ker = _grads_both_paths(monkeypatch, loss, args)
    _assert_close(g_ref, g_ker)


def test_attn_bwd_kernel_q_packing(rng, monkeypatch):
    """Q-packing in the backward (several whole images per grid step):
    B=4 single-window 8x8 images pack Q=4; dlam's revisited (Q,1,h)
    output block and the per-image lam slices must stay aligned."""
    monkeypatch.setenv("FAIRM_ATTN_Q", "512")
    B, H, W, C, h, win = 4, 8, 8, 8, 2, 8
    args = _attn_args(rng, B, H, W, C, h, win)
    lam = _mk(rng)(B, h) * 0.3
    args = args + (lam,)

    def loss(*a):
        return jnp.sum(lb.fused_block_attention(
            *a[:12], None, a[12], win, 1e-6, True) ** 2)

    g_ref, g_ker = _grads_both_paths(monkeypatch, loss, args)
    _assert_close(g_ref, g_ker)


def test_ffn_bwd_kernel_all_grads_multi_tile(rng, monkeypatch):
    """LeFF-half backward kernel with the tile budget forced to T=2 so
    nI=8: the 2-row x halo / 1-row g halo reconstruction and the
    boundary-row zeroing (conv zero padding) are load-bearing."""
    monkeypatch.setenv("FAIRM_FFN_BWD_T_MB", "0")
    mk = _mk(rng)
    B, H, W, C, Hd = 2, 16, 16, 8, 16
    args = (mk(B, H, W, C) * 0.5, 1.0 + 0.1 * mk(C), 0.1 * mk(C),
            mk(C, Hd) * 0.2, mk(Hd) * 0.1, mk(3, 3, Hd) * 0.2,
            mk(Hd) * 0.1, mk(Hd, C) * 0.2, mk(C) * 0.1)

    def loss(*a):
        return jnp.sum(lb.fused_block_ffn(*a, 1e-6, True) ** 2)

    g_ref, g_ker = _grads_both_paths(monkeypatch, loss, args)
    _assert_close(g_ref, g_ker)


def test_freq_intra_bwd_kernel_per_band_bias(rng, monkeypatch):
    """Per-band intra backward: band-indexed dbias blocks accumulate per
    contiguous band in the batch-major grid (L=2 bands x 2 images)."""
    monkeypatch.setenv("FAIRM_ATTN_BWD_T_MB", "0")
    L, B, H, W, C, h, win = 2, 2, 16, 16, 8, 2, 8
    n = win * win
    mk = _mk(rng)
    base = _attn_args(rng, L * B, H, W, C, h, win)
    biasA = mk(L, h, n, n) * 0.05
    args = base[:11] + (biasA,)

    def loss(*a):
        return jnp.sum(lb.fused_freq_intra(
            *a, None, L, win, 1e-6, True) ** 2)

    g_ref, g_ker = _grads_both_paths(monkeypatch, loss, args)
    _assert_close(g_ref, g_ker)


@pytest.mark.parametrize("with_mask", [False, True])
def test_freq_inter_bwd_kernel(rng, monkeypatch, with_mask):
    """Grouped cross-band inter backward: dbias over the full (L*n)^2
    table, residual passthrough dres == g, optional shift mask."""
    L, B, h, win = 2, 1, 2, 8
    H = W = 16
    C = 8
    n = win * win
    mk = _mk(rng)
    base = _attn_args(rng, L * B, H, W, C, h, win)
    x = base[0]
    res = mk(L * B, H, W, C)
    biasB = mk(h, L * n, L * n) * 0.05
    mask = (jnp.asarray(win_ops.shift_attn_mask(H, W, win, win // 2))
            if with_mask else None)
    args = (x, res) + base[3:11] + (biasB,)

    def loss(*a):
        return jnp.sum(lb.fused_freq_inter(
            *a, mask, L, win, 1e-6, True) ** 2)

    g_ref, g_ker = _grads_both_paths(monkeypatch, loss, args)
    _assert_close(g_ref, g_ker)


def test_bwd_fit_gates_deep_stage():
    """The C=896 bottleneck exceeds the attention backward's VMEM
    residency model (19.2 MB of weights+accumulators) and the
    Hd=3584 FFN exceeds the FFN backward's -> both fall back to the
    XLA-recompute backward; every shallower flagship stage fits."""
    assert not lbb.attn_bwd_fits(896, 8, 8, 2)
    assert not lbb.ffn_bwd_fits(896, 3584, 8, 2)
    assert lbb.attn_bwd_fits(448, 8, 16, 2)
    assert lbb.ffn_bwd_fits(448, 1792, 16, 2)
    assert lbb.attn_bwd_fits(28, 8, 128, 2)
    assert lbb.ffn_bwd_fits(28, 112, 128, 2)
