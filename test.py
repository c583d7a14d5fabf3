"""CLI eval entry point — same flag surface as the reference test.py.

Evaluates every ``--test_de_type`` task with tiled inference and writes
``epoch_<N>_results.log`` in the reference's format. Loads the checkpoint at
``--epochs`` if one exists under ``<output_path>/ckpt/`` (the reference ships
this load commented out, test.py:94 — here it actually loads).
"""

import jax

from frequency_wised_all_in_one_image_restoration_model_tpu import config as config_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.evaluation import runner as eval_runner
from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import build_models
from frequency_wised_all_in_one_image_restoration_model_tpu.training import checkpoint as ckpt_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import (
    build_train_loader, eval_variables)
from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import create_train_state
from frequency_wised_all_in_one_image_restoration_model_tpu.utils.logging import write_epoch_results_log


def main(cfg):
    # params are initialized at patch_size, applied at crop_test_imgs_size
    # tiles — fail fast if the Uformer window clamps differ (config.py)
    config_lib.check_uformer_window_compat(cfg)
    bundle = build_models(cfg, eval_mode=True)
    loader = build_train_loader(cfg, seed=cfg.seed)
    state = create_train_state(cfg, bundle, jax.random.PRNGKey(cfg.seed),
                               loader.next_batch())
    epoch = ckpt_lib.select_eval_epoch(cfg.ckpt_path, cfg.epochs)
    if epoch is not None:
        if epoch != cfg.epochs:
            print(f"checkpoint epoch_{cfg.epochs} not found; "
                  f"falling back to latest epoch_{epoch}")
        state = ckpt_lib.restore(cfg.ckpt_path, epoch, state)
        print(f"loaded checkpoint epoch_{epoch}")

    enc_vars, dec_vars = eval_variables(state)
    eval_fn = eval_runner.make_eval_fn(bundle)
    # spatial-tiling parallelism (SURVEY §2.4): with --mesh_data/--mesh_task
    # > 1 the pooled tile batch is sharded over the device mesh — tiles are
    # independent, so eval scales across chips with zero halo exchange
    mesh = None
    if cfg.mesh_data * cfg.mesh_task > 1:
        from frequency_wised_all_in_one_image_restoration_model_tpu.parallel import (
            mesh as mesh_lib)
        mesh = mesh_lib.make_mesh(cfg.mesh_data, cfg.mesh_task)
    rows = []
    for task in cfg.test_de_type:
        print("starting testing %s..." % task)
        result = eval_runner.test_by_task(cfg, bundle, enc_vars, dec_vars,
                                          task, epochs=cfg.epochs,
                                          eval_fn=eval_fn, mesh=mesh)
        print(result.replace("PSNR/SSIM", "PSNR/SSIM"))
        rows.append((task, result))
    path = write_epoch_results_log(cfg, cfg.epochs, rows)
    print("wrote", path)


if __name__ == "__main__":
    main(config_lib.parse_args())
