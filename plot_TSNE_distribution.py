"""t-SNE of degradation embeddings colored by task
(reference plot_TSNE_distribution.py:74-94)."""
import os

import jax

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import embeddings as emb
from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import build_models
from frequency_wised_all_in_one_image_restoration_model_tpu.training import checkpoint as ckpt_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import (
    build_train_loader, eval_variables)
from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import create_train_state
from frequency_wised_all_in_one_image_restoration_model_tpu.utils.visualization import plot_scatter

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

    encode = jax.jit(lambda x: bundle.encoder.apply(enc_vars, x, train=False)[1])
    batches = [loader.next_batch() for _ in range(16)]
    E, ids = emb.collect_embeddings(encode, batches)
    pts = emb.tsne_embed(E)
    xs = [pts[ids == i, 0] for i in range(len(cfg.de_type))]
    ys = [pts[ids == i, 1] for i in range(len(cfg.de_type))]
    out = os.path.join(cfg.output_path, "tsne.png")
    os.makedirs(cfg.output_path, exist_ok=True)
    plot_scatter(xs, ys, labels=list(cfg.de_type), set_lim=False, save_path=out)
    print("wrote", out)
