"""Native I/O runtime tests: decode round-trip, fused crop-augment parity
with the numpy implementation, noise statistics."""

import os

import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu.data import augment, native


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="native lib not built")


@requires_native
def test_decode_png_roundtrip(tmp_path, rng):
    from PIL import Image
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    got = native.decode_rgb(p)
    np.testing.assert_array_equal(got, img)


@requires_native
def test_decode_jpeg(tmp_path, rng):
    from PIL import Image
    img = np.full((32, 32, 3), 128, np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(img).save(p, quality=95)
    got = native.decode_rgb(p)
    assert got.shape == (32, 32, 3)
    assert abs(int(got.mean()) - 128) <= 2  # lossy but close


@requires_native
@pytest.mark.parametrize("mode", list(range(8)))
def test_crop_augment_matches_numpy(rng, mode):
    img = rng.integers(0, 256, (24, 30, 3), dtype=np.uint8)
    iy, ix, size = 3, 5, 16
    got = native.crop_augment_f32(img, iy, ix, size, mode)
    crop = img[iy:iy + size, ix:ix + size]
    expected = np.ascontiguousarray(
        augment.dihedral(crop, mode)).astype(np.float32) / 255.0
    np.testing.assert_allclose(got, expected, atol=1e-7)


@requires_native
def test_gaussian_noise_statistics(rng):
    img = np.full((128, 128, 3), 128, np.uint8)
    out = native.gaussian_noise_u8(img, sigma=25.0, seed=42)
    diff = out.astype(np.float32) - 128.0
    assert abs(float(diff.mean())) < 1.0
    assert abs(float(diff.std()) - 25.0) < 1.5
    # deterministic per seed
    out2 = native.gaussian_noise_u8(img, sigma=25.0, seed=42)
    np.testing.assert_array_equal(out, out2)
    out3 = native.gaussian_noise_u8(img, sigma=25.0, seed=43)
    assert not np.array_equal(out, out3)


def test_fallbacks_work_without_native(monkeypatch, rng):
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out = native.crop_augment_f32(img, 0, 0, 16, 2)
    assert out.shape == (16, 16, 3)
    noisy = native.gaussian_noise_u8(img, 15.0, 7)
    assert noisy.shape == img.shape
