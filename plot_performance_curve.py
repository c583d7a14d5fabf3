"""PSNR-vs-epoch curves from epoch_N_results.log files
(reference plot_performance_curve.py:8-26)."""
import os

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import performance
from frequency_wised_all_in_one_image_restoration_model_tpu.utils.visualization import plot_curve

if __name__ == "__main__":
    cfg = config_lib.parse_args()
    series = performance.parse_epoch_results(cfg.output_path, cfg.epochs)
    series = [s for s in series if s]
    if series:
        plot_curve(series, x_range=(0, len(series[0])),
                   labels=list(cfg.test_de_type)[: len(series)],
                   xlabel="Epochs", ylabel="PSNR",
                   save_path=os.path.join(cfg.output_path, "PSNR_curve.png"))
        print("wrote", os.path.join(cfg.output_path, "PSNR_curve.png"))
    else:
        print("no epoch_N_results.log files found under", cfg.output_path)
