"""Plot contrast/L1 loss curves from train.log (reference plot_loss_curve.py)."""
from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.utils.visualization import plot_loss_curve

if __name__ == "__main__":
    cfg = config_lib.parse_args()
    print("wrote", plot_loss_curve(cfg.output_path))
