"""Dump the learned per-band attention gains `lamb`
(reference plot_lamb_curve.py:41-49)."""
import jax

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import embeddings as emb
from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import build_models
from frequency_wised_all_in_one_image_restoration_model_tpu.training import checkpoint as ckpt_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import build_train_loader
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
    lambs = emb.extract_lamb_params(state.params)
    for path, val in lambs.items():
        print(path, val.tolist())
