"""Per-degradation FFT band-energy histograms
(reference plot_frequency_distribution.py:10-52). Uses the on-disk datasets,
or --synthetic_data for a hermetic run."""
import itertools
import os

import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import frequency_dist
from frequency_wised_all_in_one_image_restoration_model_tpu.evaluation.runner import build_test_dataset
from frequency_wised_all_in_one_image_restoration_model_tpu.utils.visualization import plot_curve

if __name__ == "__main__":
    cfg = config_lib.parse_args()
    hists = []
    for task in cfg.test_de_type:
        ds = build_test_dataset(cfg, task)
        imgs = [np.asarray(d) * 255.0 for _, d, _ in itertools.islice(iter(ds), 8)]
        hists.append(frequency_dist.dataset_band_histogram(imgs))
        print(task, np.round(hists[-1], 4))
    out = os.path.join(cfg.output_path, "frequency_distribution.png")
    os.makedirs(cfg.output_path, exist_ok=True)
    plot_curve(hists, labels=list(cfg.test_de_type), xlabel="band",
               ylabel="energy", ylim=(0, 1), save_path=out)
    print("wrote", out)
