"""Frequency decomposition op tests.

Includes the completeness check the reference left commented out
(encoder_ViT.py:88: ``sum(bands) == attn``) and golden-value parity against a
straight numpy re-execution of the reference algorithm
(net/utils/frequency_decompose.py:28-118).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu.ops import frequency


def _reference_decompose_np(x, size, variant):
    """Literal numpy re-execution of the reference loop (torch-free)."""
    h, w = x.shape[-2:]
    fre = np.fft.fftshift(np.fft.fft2(x), axes=(-2, -1))
    Y = np.arange(h)[:, None]
    X = np.arange(w)[None, :]
    center = (int(w / 2), int(h / 2))
    dist = np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2)
    max_radius = np.sqrt(center[0] ** 2 + center[1] ** 2)
    num_bands = int(np.floor(1.0 / size + 0.1))
    last = np.zeros((h, w), dtype=bool)
    out = []
    if variant == "open":
        for sz in np.linspace(size, 1, num_bands):
            r = max_radius * sz
            mask = dist <= r if sz == 1.0 else dist < r
            cur = mask ^ last
            last = mask
            banded = cur * fre
            out.append(np.fft.ifft2(np.fft.ifftshift(banded, axes=(-2, -1))).real)
    else:
        for sz in np.linspace(0, 1, num_bands + 1):
            mask = dist <= max_radius * sz
            cur = mask ^ last
            last = mask
            banded = cur * fre
            out.append(np.fft.ifft2(np.fft.ifftshift(banded, axes=(-2, -1))).real)
    return np.stack(out)


@pytest.mark.parametrize("num_bands", [2, 5])
def test_open_rings_match_reference_numerics(rng, num_bands):
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    ours = np.asarray(frequency.frequency_decompose(jnp.asarray(x), num_bands))
    ref = _reference_decompose_np(x, 1.0 / num_bands, "open")
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_dc_ring_variant_matches_reference_numerics(rng):
    x = rng.standard_normal((1, 2, 16, 16)).astype(np.float32)
    ours = np.asarray(frequency.frequency_decompose_1(jnp.asarray(x), 2))
    ref = _reference_decompose_np(x, 1.0 / 2, "dc")
    assert ours.shape == (3, 1, 2, 16, 16)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_bands_sum_to_input(rng):
    # the assertion the reference disabled (encoder_ViT.py:88)
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    bands = np.asarray(frequency.frequency_decompose(jnp.asarray(x), 5))
    np.testing.assert_allclose(bands.sum(0), x, atol=1e-4)


def test_masks_partition_disk():
    m_open = frequency.ring_masks(64, 64, 5, "open")
    m_dc = frequency.ring_masks(64, 64, 2, "dc")
    assert m_open.shape == (5, 64, 64)
    assert m_dc.shape == (3, 64, 64)
    # bands are disjoint
    assert (m_open.sum(0) <= 1.0 + 1e-6).all()
    assert (m_dc.sum(0) <= 1.0 + 1e-6).all()
    # DC variant band 0 is exactly the center point
    assert m_dc[0].sum() == 1.0
    assert m_dc[0, 32, 32] == 1.0


def test_dc_mean_residual_split(rng):
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    out = np.asarray(frequency.frequency_decompose_dc(jnp.asarray(x)))
    np.testing.assert_allclose(out[0], np.broadcast_to(x.mean((-2, -1), keepdims=True), x.shape), atol=1e-6)
    np.testing.assert_allclose(out.sum(0), x, atol=1e-6)


def test_spectrum_mode_shapes(rng):
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    spec = frequency.frequency_decompose(jnp.asarray(x), 4, inverse=False)
    assert spec.shape == (4, 2, 3, 16, 16, 2)
    vis = frequency.frequency_decompose(jnp.asarray(x), 4, inverse="visual")
    assert vis.shape == (4, 2, 3, 16, 16)
    assert bool(jnp.all(vis >= 0))


def test_jit_and_grad():
    x = jnp.ones((1, 1, 16, 16))

    @jax.jit
    def f(x):
        return jnp.sum(jnp.abs(frequency.frequency_decompose(x, 3)))

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
