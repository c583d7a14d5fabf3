"""Variant 3: latent-space LFC/HFC scatter through the degradation encoder
(reference plot_frequency_distribution_3.py:29-45: per test task, run net.E
and histogram the spatial inter map)."""
import os

import jax
import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.evaluation.runner import build_test_dataset
from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import build_models
from frequency_wised_all_in_one_image_restoration_model_tpu.training import checkpoint as ckpt_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import (
    build_train_loader, eval_variables)
from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import create_train_state
from frequency_wised_all_in_one_image_restoration_model_tpu.utils.visualization import (
    get_frequency_distribution, plot_scatter)

if __name__ == "__main__":
    cfg = config_lib.parse_args()
    bundle = build_models(cfg, eval_mode=True)
    loader = build_train_loader(cfg, seed=cfg.seed)
    state = create_train_state(cfg, bundle, jax.random.PRNGKey(cfg.seed),
                               loader.next_batch())
    ep = ckpt_lib.latest_epoch(cfg.ckpt_path)
    if ep is not None:
        state = ckpt_lib.restore(cfg.ckpt_path, ep, state)
    enc_vars, _ = eval_variables(state)

    def spatial_inter(x):
        _, _, inter = bundle.encoder.apply(enc_vars, x, train=False)
        if hasattr(inter, "band_inter"):  # Uformer context -> band-0 map
            t = inter.band_inter[0]
            side = int(np.sqrt(t.shape[1]))
            return np.asarray(t).reshape(-1, side, side, t.shape[-1])
        return np.asarray(inter)

    lows, highs = [], []
    for task in cfg.test_de_type:
        ds = build_test_dataset(cfg, task)
        low, high = [], []
        for idx, (name, degraded, clean) in enumerate(ds):
            if idx == 8:
                break
            p = cfg.crop_test_imgs_size
            inter = spatial_inter(degraded[None, :p, :p])
            gray = inter[0].mean(-1)
            hist = get_frequency_distribution(gray.astype(np.float64), norm=False)
            low.append(hist[0])
            high.append(np.sum(hist[1:]))
        lows.append(low)
        highs.append(high)
    out = os.path.join(cfg.output_path, "latent_lfc_hfc.png")
    os.makedirs(cfg.output_path, exist_ok=True)
    plot_scatter(lows, highs, labels=list(cfg.test_de_type), xlabel="latent LFC",
                 ylabel="latent HFC", set_lim=False, save_path=out)
    print("wrote", out)
