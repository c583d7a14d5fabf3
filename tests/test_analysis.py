"""Analysis toolkit tests: log parsing, histograms, lamb extraction,
attention capture, LFS scores."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu import config
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import (
    embeddings, frequency_dist, lfs, msa_frequency, performance)
from frequency_wised_all_in_one_image_restoration_model_tpu.utils import visualization


def test_parse_results_log(tmp_path):
    p = tmp_path / "results.log"
    p.write_text(
        "101 Epochs Results:\n"
        "denoising_bsd68_15:        PSNR/SSIM: 30.12/0.8712\n"
        "deraining:                 PSNR/SSIM: 28.50/0.8301\n"
        "102 Epochs Results:\n"
        "denoising_bsd68_15:        PSNR/SSIM: 31.00/0.8800\n"
        "deraining:                 PSNR/SSIM: 29.00/0.8400\n")
    perf = performance.parse_results_log(str(p), 2)
    assert perf[0] == [(30.12, 0.8712), (31.00, 0.88)]
    s = performance.best_k_summary(perf[0])
    assert s["best"][0] == (31.00, 0.88)


def test_parse_train_log_roundtrip(tmp_path):
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.logging import RunLogs
    cfg = config.make_config(output_path=str(tmp_path) + "/")
    logs = RunLogs(cfg)
    logs.log_epoch_encoder(0, 1.2345)
    logs.log_epoch_joint(1, 0.0321, 0.9876)
    logs.close()
    contrast, l1, first = visualization.parse_train_log(cfg.output_path)
    assert contrast == [1.2345, 0.9876]
    assert l1 == [0.0, 0.0321]
    assert first == 1


def test_loss_curve_plot(tmp_path):
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.logging import RunLogs
    cfg = config.make_config(output_path=str(tmp_path) + "/")
    logs = RunLogs(cfg)
    for e in range(3):
        logs.log_epoch_encoder(e, 1.0 / (e + 1))
    logs.log_epoch_joint(3, 0.05, 0.2)
    logs.close()
    out = visualization.plot_loss_curve(cfg.output_path)
    assert os.path.exists(out)


def test_frequency_histogram_properties(rng):
    img = rng.uniform(0, 255, (32, 32, 3))
    hist = frequency_dist.dataset_band_histogram([img])
    assert hist.shape == (5,)
    assert abs(hist.sum() - 1.0) < 1e-6
    lfc, hfc = frequency_dist.lfc_hfc(img)
    assert abs(lfc + hfc - 1.0) < 1e-6


def test_extract_lamb(rng):
    params = {"attn_0": {"lamb": np.zeros((2, 1, 4)), "w": np.ones((3, 3))},
              "deep": {"attn_1": {"lamb": np.ones((2, 1, 4))}}}
    found = embeddings.extract_lamb_params(params)
    assert set(found) == {"attn_0/lamb", "deep/attn_1/lamb"}


def test_attention_capture_and_band_report():
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_blocks import (
        WindowAttention)
    attn = WindowAttention(dim=8, win_size=4, num_heads=2)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 8))
    variables = attn.init(jax.random.PRNGKey(1), x)
    maps = msa_frequency.collect_attention_maps(
        lambda v, x, **kw: attn.apply(v, x, **kw), variables, x)
    assert len(maps) == 1
    (path, amap), = maps.items()
    assert amap.shape == (2, 2, 16, 16)
    hist = msa_frequency.attention_band_energy(amap, 4)
    assert abs(hist.sum() - 1.0) < 1e-5


def test_gaussian_filter_lowpass(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    low = lfs.gaussian_filter_fft(x, cutoff=0.1)
    # low-pass output is smoother: total variation decreases
    tv = lambda a: float(jnp.abs(jnp.diff(a, axis=1)).mean())
    assert tv(low) < tv(x)


def test_taylor_scores_and_mask():
    params = {"layer": {"kernel": np.ones((3, 3, 2, 4), np.float32)}}
    grads = {"layer": {"kernel": np.full((3, 3, 2, 4), 0.5, np.float32)}}
    scores = lfs.taylor_scores(params, grads)
    assert scores["layer/kernel"].shape == (4,)
    masks, thresh = lfs.channel_mask(scores, prune_ratio=0.5)
    assert masks["layer/kernel"].shape == (4,)
