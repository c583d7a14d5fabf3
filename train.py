"""CLI training entry point — same flag surface as the reference train.py.

Example (hermetic, no datasets needed):
    python train.py --synthetic_data --epochs 2 --epochs_encoder 1 \
        --de_type 2tasks --encoder_type ResNet --decoder_type ResNet \
        --patch_size 32 --steps_per_epoch 4 --output_path /tmp/out/
"""

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import run_training

if __name__ == "__main__":
    cfg = config_lib.parse_args()
    run_training(cfg)
