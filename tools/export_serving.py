"""Export the flagship eval forward as a self-contained serving artifact.

Loads the checkpoint the same way ``test.py`` does (latest epoch under
``<output_path>/ckpt/`` when present; fresh init otherwise), AOT-exports
the restoration forward via ``jax.export`` and writes a single ``.fairm``
file (StableHLO + weights). A server needs only jax + this file:

    from frequency_wised_all_in_one_image_restoration_model_tpu import serving
    model = serving.load("flagship.fairm")
    restored = model(tiles)        # [B, p, p, 3] float32

Usage:
  python tools/export_serving.py --out flagship.fairm [--batch 8]
      [--platforms tpu] [--check] [<any train.py/test.py flags>]

``--platforms tpu`` cross-compiles a TPU artifact from a CPU host.
``--check`` deserializes the artifact in-process and verifies it matches
the direct eval forward on random tiles.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--out", default="flagship.fairm")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--platforms", nargs="+", default=None)
    ap.add_argument("--check", action="store_true")
    ns, rest = ap.parse_known_args(argv)

    from frequency_wised_all_in_one_image_restoration_model_tpu import (
        config as config_lib, serving)
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import (
        build_models)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training import (
        checkpoint as ckpt_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import (
        build_train_loader, eval_variables)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import (
        create_train_state)

    cfg = config_lib.parse_args(rest)
    bundle = build_models(cfg, eval_mode=True)
    loader = build_train_loader(cfg, seed=cfg.seed)
    state = create_train_state(cfg, bundle, jax.random.PRNGKey(cfg.seed),
                               loader.next_batch())
    latest = ckpt_lib.latest_epoch(cfg.ckpt_path)
    if latest is not None:
        state = ckpt_lib.restore(cfg.ckpt_path, latest, state)
        print(f"loaded checkpoint epoch_{latest}")
    else:
        print("no checkpoint found; exporting fresh-init weights")

    variables = eval_variables(state)
    blob = serving.export_eval(cfg, variables, batch=ns.batch,
                               platforms=ns.platforms)
    serving.save(ns.out, blob)
    print(f"wrote {ns.out}: {len(blob)/2**20:.1f} MiB "
          f"(batch {ns.batch}, {cfg.crop_test_imgs_size}^2 tiles)")

    if ns.check:
        from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import (
            eval_forward)
        model = serving.load(ns.out)
        rng = np.random.default_rng(0)
        p = cfg.crop_test_imgs_size
        tiles = rng.uniform(0, 1, (max(1, ns.batch - 1), p, p, 3)
                            ).astype(np.float32)
        got = np.asarray(model(tiles))
        want = np.asarray(jax.jit(
            lambda e, d, x: eval_forward(bundle, e, d, x))(
                *variables, tiles))
        err = float(np.max(np.abs(got - want)))
        print(f"serve-check: max|artifact - direct| = {err:.3e} "
              f"({'OK' if err < 1e-4 else 'MISMATCH'})")
        if err >= 1e-4:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
