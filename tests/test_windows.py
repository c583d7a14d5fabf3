"""Window op tests: round-trip, bias indexing, shift-mask parity."""

import jax.numpy as jnp
import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu.ops import windows


def test_partition_reverse_roundtrip(rng):
    x = rng.standard_normal((2, 16, 16, 5)).astype(np.float32)
    w = windows.window_partition(jnp.asarray(x), 8)
    assert w.shape == (2 * 4, 8, 8, 5)
    back = windows.window_reverse(w, 8, 16, 16)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_partition_window_content(rng):
    x = rng.standard_normal((1, 4, 4, 1)).astype(np.float32)
    w = np.asarray(windows.window_partition(jnp.asarray(x), 2))
    np.testing.assert_array_equal(w[0, :, :, 0], x[0, :2, :2, 0])
    np.testing.assert_array_equal(w[1, :, :, 0], x[0, :2, 2:, 0])
    np.testing.assert_array_equal(w[2, :, :, 0], x[0, 2:, :2, 0])


def test_relative_position_index_reference_semantics():
    # reference encoder_Uformer.py:124-135 re-executed in numpy
    wh = ww = 4
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    expected = rel.sum(-1)
    got = windows.relative_position_index(wh, ww)
    np.testing.assert_array_equal(got, expected)
    assert got.min() >= 0 and got.max() < (2 * wh - 1) * (2 * ww - 1)
    # diagonal (self-relative) hits the table center
    assert (np.diag(got) == (wh - 1) * (2 * ww - 1) + (ww - 1)).all()


def test_shift_mask_reference_semantics():
    # reference encoder_Uformer.py:613-631 re-executed in numpy
    H = W = 16
    win, shift = 8, 4
    img = np.zeros((1, H, W, 1), dtype=np.float32)
    cnt = 0
    sl = (slice(0, -win), slice(-win, -shift), slice(-shift, None))
    for hs in sl:
        for ws in sl:
            img[:, hs, ws, :] = cnt
            cnt += 1
    wins = img.reshape(1, H // win, win, W // win, win, 1).transpose(0, 1, 3, 2, 4, 5)
    wins = wins.reshape(-1, win * win)
    diff = wins[:, None, :] - wins[:, :, None]
    expected = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
    got = windows.shift_attn_mask(H, W, win, shift)
    np.testing.assert_array_equal(got, expected)


def test_band_mask():
    m = windows.band_mask(3, 2, "intra")
    assert m.shape == (6, 6)
    assert m[0, 1] == 0.0 and m[0, 2] == -100.0
    mi = windows.band_mask(3, 2, "inter")
    np.testing.assert_array_equal(m + mi, np.full((6, 6), -100.0))


def test_gather_relative_bias_shape(rng):
    table = jnp.asarray(rng.standard_normal((15 * 15, 4)).astype(np.float32))
    bias = windows.gather_relative_bias(table, 8, 8)
    assert bias.shape == (4, 64, 64)
