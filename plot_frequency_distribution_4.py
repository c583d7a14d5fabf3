"""Variant 4: clean-vs-degraded band-energy comparison per task
(reference plot_frequency_distribution_4.py)."""
import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import frequency_dist
from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import build_train_loader

if __name__ == "__main__":
    cfg = config_lib.parse_args()
    loader = build_train_loader(cfg, seed=cfg.seed)
    for i, task in enumerate(cfg.de_type):
        degraded, clean = [], []
        for _ in range(8):
            b = loader.next_batch()
            degraded.append(b["d1"][i] * 255.0)
            clean.append(b["c1"][i] * 255.0)
        hd = frequency_dist.dataset_band_histogram(degraded)
        hc = frequency_dist.dataset_band_histogram(clean)
        print(task, "degraded", np.round(hd, 4), "clean", np.round(hc, 4))
