"""Fused Pallas window-attention kernel vs the XLA reference (interpret
mode on the CPU backend; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu.ops.pallas.window_attention import (
    _xla_reference, fused_window_attention)


def _setup(rng, w=8, h=2, n=16, nk=None, d=8, with_mask=True, nw=4):
    nk = nk or n
    q = jnp.asarray(rng.standard_normal((w, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((w, h, nk, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((w, h, nk, d)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((h, n, nk)).astype(np.float32)) * 0.1
    mask = None
    if with_mask:
        m = np.zeros((nw, n, nk), np.float32)
        m[1::2, :, : nk // 2] = -100.0  # some windows mask half the keys
        mask = jnp.asarray(m)
    return q, k, v, bias, mask


def test_kernel_matches_reference_no_mask(rng):
    q, k, v, bias, _ = _setup(rng, with_mask=False)
    scale = q.shape[-1] ** -0.5
    ref, _ = _xla_reference(q, k, v, bias, None, scale, 1)
    out = fused_window_attention(q, k, v, bias, None, scale, 1, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_matches_reference_with_mask(rng):
    q, k, v, bias, mask = _setup(rng)
    scale = q.shape[-1] ** -0.5
    ref, _ = _xla_reference(q, k, v, bias, mask, scale, 4)
    out = fused_window_attention(q, k, v, bias, mask, scale, 4, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_packing_exactness(rng):
    # n=16 -> P=8 windows per tile; cross-window leakage must be exactly 0:
    # perturbing window 1's k/v must not change window 0's output
    q, k, v, bias, _ = _setup(rng, w=8, with_mask=False)
    scale = q.shape[-1] ** -0.5
    out0 = fused_window_attention(q, k, v, bias, None, scale, 1, True)
    k2 = k.at[1].add(100.0)
    v2 = v.at[1].add(100.0)
    out1 = fused_window_attention(q, k2, v2, bias, None, scale, 1, True)
    np.testing.assert_array_equal(np.asarray(out0[0]), np.asarray(out1[0]))
    assert not np.allclose(np.asarray(out0[1]), np.asarray(out1[1]))


def test_kernel_rect_kv(rng):
    # kv longer than n (the decoder's attention_kv ratio case)
    q, k, v, bias, _ = _setup(rng, n=16, nk=32, with_mask=False)
    scale = q.shape[-1] ** -0.5
    ref, _ = _xla_reference(q, k, v, bias, None, scale, 1)
    out = fused_window_attention(q, k, v, bias, None, scale, 1, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_gradient_matches_reference(rng):
    q, k, v, bias, mask = _setup(rng, w=4, nw=4)
    scale = q.shape[-1] ** -0.5

    def loss_fused(q, k, v, bias):
        return jnp.sum(
            fused_window_attention(q, k, v, bias, mask, scale, 4, True) ** 2)

    def loss_ref(q, k, v, bias):
        out, _ = _xla_reference(q, k, v, bias, mask, scale, 4)
        return jnp.sum(out ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_inputs(rng):
    q, k, v, bias, mask = _setup(rng)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    scale = q.shape[-1] ** -0.5
    out = fused_window_attention(qb, kb, vb, bias, mask, scale, 4, True)
    assert out.dtype == jnp.bfloat16
    ref, _ = _xla_reference(qb, kb, vb, bias, mask, scale, 4)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fused_backward_multi_program_dbias(rng):
    # w large enough that the grid has several programs: dbias must
    # accumulate correctly across sequential grid steps
    q, k, v, bias, _ = _setup(rng, w=128, with_mask=False)
    scale = q.shape[-1] ** -0.5

    def loss_fused(q, k, v, bias):
        return jnp.sum(
            fused_window_attention(q, k, v, bias, None, scale, 1, True) ** 2)

    def loss_ref(q, k, v, bias):
        out, _ = _xla_reference(q, k, v, bias, None, scale, 1)
        return jnp.sum(out ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_backward_bf16(rng):
    q, k, v, bias, mask = _setup(rng, w=8, nw=4)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    scale = q.shape[-1] ** -0.5

    def loss_fused(q, k, v, bias):
        out = fused_window_attention(q, k, v, bias, mask, scale, 4, True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v, bias):
        out, _ = _xla_reference(q, k, v, bias, mask, scale, 4)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(qb, kb, vb, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(qb, kb, vb, bias)
    assert g_fused[0].dtype == jnp.bfloat16
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-2)


def test_fused_backward_rect_kv(rng):
    q, k, v, bias, _ = _setup(rng, n=16, nk=32, with_mask=False)
    scale = q.shape[-1] ** -0.5

    def loss_fused(q, k, v, bias):
        return jnp.sum(
            fused_window_attention(q, k, v, bias, None, scale, 1, True) ** 2)

    def loss_ref(q, k, v, bias):
        out, _ = _xla_reference(q, k, v, bias, None, scale, 1)
        return jnp.sum(out ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
