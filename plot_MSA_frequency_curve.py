"""Aggregate per-layer MSA band-energy curves across noise levels
(reference plot_MSA_frequency_curve.py: parses after_MSA_<sigma>.log files;
here computed directly from the model via sown attention maps)."""
import os

import jax
import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import msa_frequency
from frequency_wised_all_in_one_image_restoration_model_tpu.data.synthetic import degrade, smooth_image
from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import build_models
from frequency_wised_all_in_one_image_restoration_model_tpu.training import checkpoint as ckpt_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import (
    build_train_loader, eval_variables)
from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import create_train_state
from frequency_wised_all_in_one_image_restoration_model_tpu.utils.visualization import plot_curve

if __name__ == "__main__":
    cfg = config_lib.parse_args()
    bundle = build_models(cfg, eval_mode=True)
    loader = build_train_loader(cfg, seed=cfg.seed)
    state = create_train_state(cfg, bundle, jax.random.PRNGKey(cfg.seed),
                               loader.next_batch())
    ep = ckpt_lib.latest_epoch(cfg.ckpt_path)
    if ep is not None:
        state = ckpt_lib.restore(cfg.ckpt_path, ep, state)
    enc_vars, dec_vars = eval_variables(state)

    rng = np.random.default_rng(cfg.seed)
    p = cfg.crop_test_imgs_size
    curves, labels = [], []
    for sigma in (15, 25, 50, 75):
        clean = smooth_image(rng, p, p)
        x = degrade(clean, f"denoising_{sigma}", rng).astype(np.float32)[None] / 255.0
        _, _, ctx = bundle.encoder.apply(enc_vars, x, train=False)
        report = msa_frequency.model_attention_band_report(
            bundle.decoder.apply, dec_vars, x, inter=ctx, train=False)
        layers = sorted(report)
        curves.append([float(report[k][-1]) for k in layers])  # top band share
        labels.append(f"sigma={sigma}")
    out = os.path.join(cfg.output_path, "msa_band_curve.png")
    os.makedirs(cfg.output_path, exist_ok=True)
    plot_curve(curves, labels=labels, xlabel="attention layer",
               ylabel="high-band energy share", ylim=(0, 1), save_path=out)
    print("wrote", out)
