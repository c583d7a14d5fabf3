"""Performance-path equivalence tests (fast paths must match reference math)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_all_dc_algebraic_identity(rng):
    """all_DC modulation: materialized band computation vs the rank-1
    algebraic rewrite used in WindowAttention's fast path."""
    B, h, n, d = 4, 2, 16, 8
    logits = jnp.asarray(rng.standard_normal((B, h, n, n)).astype(np.float32))
    attn = jax.nn.softmax(logits, axis=-1)
    v = jnp.asarray(rng.standard_normal((B, h, n, d)).astype(np.float32))
    lam = jnp.asarray(rng.standard_normal((B, h)).astype(np.float32))

    # materialized (reference decoder_Uformer.py:275-288 with DC split)
    dc = jnp.mean(attn, axis=(-2, -1), keepdims=True)
    band1 = attn - dc
    modattn = attn + band1 * lam[:, :, None, None]
    ref = jnp.einsum("bhnm,bhmd->bhnd", modattn, v)

    # algebraic: (1+λ)·(attn@v) − (λ/n)·Σ_m v[m]
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    v_sum = jnp.sum(v, axis=2)
    fast = (out * (1 + lam)[:, :, None, None]
            - (lam / n)[:, :, None, None] * v_sum[:, :, None, :])

    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # sanity of the key identity: softmax attention's DC is exactly 1/n
    np.testing.assert_allclose(np.asarray(dc)[..., 0, 0], 1.0 / n, atol=1e-6)


def test_window_attention_all_dc_still_runs():
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_blocks import (
        WindowAttention)
    B, nW, n, c, h = 2, 4, 16, 8, 2
    attn = WindowAttention(dim=c, win_size=4, num_heads=h, num_win=nW,
                           all_bands_num=2, all_bands_dc=True,
                           encoder_embed_dim=4)
    x = jax.random.uniform(jax.random.PRNGKey(0), (B * nW, n, c))
    all_inter = [jax.random.uniform(jax.random.PRNGKey(i + 1), (B, 4, 64))
                 for i in range(2)]
    variables = attn.init(jax.random.PRNGKey(5), x, all_inter=all_inter)
    out, kv, lambs = attn.apply(variables, x, all_inter=all_inter)
    assert out.shape == (B * nW, n, c)
    assert np.isfinite(np.asarray(out)).all()


def test_intra_band_fold_matches_grouped(rng):
    """FrequencyWindowAttention 'intra' fast path (L folded into heads,
    band-diagonal bias only) vs the reference-shaped grouped computation
    (forced by making 'intermediates' mutable)."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_blocks import (
        FrequencyWindowAttention)
    from frequency_wised_all_in_one_image_restoration_model_tpu.ops import windows

    L, B, nW, n, c, h = 3, 2, 4, 16, 12, 2
    win = 4
    attn = FrequencyWindowAttention(dim=c, win_size=win, num_heads=h, L=L,
                                    kind="intra")
    x = jnp.asarray(rng.standard_normal((L * B * nW, n, c)).astype(np.float32))
    mask = jnp.asarray(windows.shift_attn_mask(8, 8, win, 2))
    variables = attn.init(jax.random.PRNGKey(0), x, mask=mask)

    fast, _ = attn.apply(variables, x, mask=mask)
    (slow, _), _ = attn.apply(variables, x, mask=mask,
                              mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=2e-5, atol=2e-5)
