"""Low-frequency-sensitivity Taylor channel scores
(reference plot_LFS_distribution.py + the truncated lfs_visualization_utils)."""
import jax
import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.analysis import lfs
from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import build_models, eval_forward
from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import (
    build_train_loader, eval_variables)
from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import create_train_state

if __name__ == "__main__":
    cfg = config_lib.parse_args()
    bundle = build_models(cfg, eval_mode=True)
    loader = build_train_loader(cfg, seed=cfg.seed)
    state = create_train_state(cfg, bundle, jax.random.PRNGKey(cfg.seed),
                               loader.next_batch())
    enc_vars, dec_vars = eval_variables(state)

    def restore_fn(params, x):
        ev = {**enc_vars, "params": params["encoder"]}
        dv = {**dec_vars, "params": params["decoder"]}
        xf = lfs.gaussian_filter_fft(x, cutoff=0.2)
        return eval_forward(bundle, ev, dv, xf)

    def embed_fn(params, x):
        ev = {**enc_vars, "params": params["encoder"]}
        return bundle.encoder.apply(ev, x, train=False)[1][0]

    batch = loader.next_batch()
    teacher = embed_fn({"encoder": enc_vars["params"],
                        "decoder": dec_vars["params"]}, batch["d1"])
    loss_fn = lfs.distillation_loss_fn(restore_fn, embed_fn, teacher)
    params = {"encoder": enc_vars["params"], "decoder": dec_vars["params"]}
    grads = lfs.lfs_gradients(
        lambda p, b: loss_fn(p, b), params,
        [{k: batch[k] for k in ("d1", "c1")} for _ in range(2)])
    scores = lfs.taylor_scores(params, grads)
    masks, thresh = lfs.channel_mask(scores, prune_ratio=0.2)
    kept = sum(int(m.sum()) for m in masks.values())
    total = sum(m.size for m in masks.values())
    print(f"threshold={thresh:.3e} kept {kept}/{total} channels")
    for name in list(scores)[:10]:
        print(name, float(np.mean(scores[name])))
