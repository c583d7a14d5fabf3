"""Variant 1: frequency histograms of TRAIN degradations (degraded inputs)
(reference plot_frequency_distribution_1.py — hard-codes a 6-task train set)."""
import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import frequency_dist
from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import build_train_loader

if __name__ == "__main__":
    cfg = config_lib.parse_args()
    loader = build_train_loader(cfg, seed=cfg.seed)
    per_task = {t: [] for t in cfg.de_type}
    for _ in range(8):
        b = loader.next_batch()
        for i, t in enumerate(cfg.de_type):
            per_task[t].append(b["d1"][i] * 255.0)
    for t, imgs in per_task.items():
        print(t, np.round(frequency_dist.dataset_band_histogram(imgs), 4))
