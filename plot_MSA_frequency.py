"""Per-layer attention-map band-energy report
(reference plot_MSA_frequency.py:20-111; debug_mode -> sown intermediates)."""
import jax
import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import msa_frequency
from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import build_models
from frequency_wised_all_in_one_image_restoration_model_tpu.training import checkpoint as ckpt_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import (
    build_train_loader, eval_variables)
from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import create_train_state

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

    x = loader.next_batch()["d1"][:1]
    _, _, ctx = bundle.encoder.apply(enc_vars, x, train=False)
    report = msa_frequency.model_attention_band_report(
        bundle.decoder.apply, dec_vars, x, inter=ctx, train=False)
    for path, hist in sorted(report.items()):
        print(path, np.round(hist, 4).tolist())
