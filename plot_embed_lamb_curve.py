"""Dump decoder embed_lamb responses per degradation task
(reference plot_embed_lamb_curve.py:59-78)."""
import jax
import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import embeddings as emb
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

    batch = loader.next_batch()
    for i, task in enumerate(cfg.de_type):
        x = batch["d1"][i:i + 1]
        _, _, ctx = bundle.encoder.apply(enc_vars, x, train=False)
        found = emb.embed_lamb_responses(bundle.decoder.apply, dec_vars, x, ctx)
        print(task)
        for path, val in sorted(found.items()):
            print(" ", path, np.round(np.asarray(val).ravel(), 4).tolist())
