"""Gather-free Pallas DCN kernel (ops/pallas/dcn.py): equality with the
exact composite on clamped offsets (its defining property), boundary and
multi-tile coverage, and the custom-VJP gradient path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu.ops.deform_conv import (
    _exact_dcn, _dcn_fast)
from frequency_wised_all_in_one_image_restoration_model_tpu.ops.pallas.dcn import (
    dcn_shift_kernel)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _setup(rng, B=2, H=32, W=16, C=8, Cout=8, scale=2.0):
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.3)
    off = jnp.asarray(rng.standard_normal(
        (B, H, W, 18)).astype(np.float32) * scale)
    mask = jax.nn.sigmoid(jnp.asarray(
        rng.standard_normal((B, H, W, 9)).astype(np.float32)))
    w = jnp.asarray(rng.standard_normal((3, 3, C, Cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((Cout,)).astype(np.float32) * 0.1)
    return x, off, mask, w, b


def _clamped_ref(x, off, mask, w, b, R):
    off_c = jnp.clip(off, -float(R), float(R))
    return _exact_dcn(x, off_c, mask, w, b)


@pytest.mark.parametrize("R", [1, 2, 4])
def test_kernel_equals_clamped_composite(rng, R):
    x, off, mask, w, b = _setup(rng, scale=R + 2.0)  # offsets exceed R
    out = dcn_shift_kernel(x, off, mask, w, b, R=R, interpret=True)
    ref = _clamped_ref(x, off, mask, w, b, R)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_multi_tile_rows(rng):
    """H big enough for several row tiles: halo rows across tile seams."""
    x, off, mask, w, b = _setup(rng, H=64)
    out = dcn_shift_kernel(x, off, mask, w, b, R=2, interpret=True)
    ref = _clamped_ref(x, off, mask, w, b, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_no_bias_and_small_offsets_match_exact(rng):
    """With |Δ| < R the clamp is inactive: kernel == exact unbounded DCN."""
    x, off, mask, w, _ = _setup(rng, scale=0.4)
    out = dcn_shift_kernel(x, off, mask, w, None, R=2, interpret=True)
    ref = _exact_dcn(x, off, mask, w, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fast_vjp_matches_clamped_composite_grads(rng):
    """jax.grad THROUGH _dcn_fast's custom VJP (kernel forward in interpret
    mode on CPU) must equal the clamped composite's gradients — the fused
    gradient path the module advertises, not just the composite's."""
    x, off, mask, w, b = _setup(rng, H=16, W=16)

    def loss_fast(x, off, mask, w, b):
        return jnp.sum(_dcn_fast(x, off, mask, w, b, 2, 1, 1) ** 2)

    def loss_ref(x, off, mask, w, b):
        return jnp.sum(_clamped_ref(x, off, mask, w, b, 2) ** 2)

    np.testing.assert_allclose(float(loss_fast(x, off, mask, w, b)),
                               float(loss_ref(x, off, mask, w, b)),
                               rtol=1e-5)
    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    for gf, gr in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)
