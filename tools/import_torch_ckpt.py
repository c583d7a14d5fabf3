"""Import a reference PyTorch checkpoint into an Orbax checkpoint.

The reference trainer saves the full AirNet ``net.state_dict()`` as
``epoch_<N>.pth`` at the final epoch (reference train.py:120-127) — flat
torch tensors under ``E.E.encoder_q.*`` / ``E.E.encoder_k.*`` /
``E.E.queue`` / ``E.E.queue_ptr`` / ``R.R.*`` (AirNet holds an Encoder
wrapper around MoCo and a Decoder wrapper around the net,
net/model.py:13-57; both single-letter prefixes are accepted too for
state_dicts saved from the bare MoCo/decoder). This CLI maps that file
onto our full TrainState via utils/torch_weights.py and writes the
``<output_path>/ckpt/epoch_<N>`` Orbax checkpoint that ``test.py`` loads
and ``train.py`` resumes from:

  encoder_q  -> params['encoder'] (+ its BatchNorm running stats)
  encoder_k  -> MoCo params_k / extra_k
  queue/ptr  -> MoCo queue (layout matches 1:1, net/utils/moco.py:38-42;
                transplanted only when --de_type implies the same K)
  R          -> params['decoder']

Optimizer moments start fresh (zeros — the reference discards its Adam
state at save time too, train.py:121-127 saves params only).

Usage:
  python tools/import_torch_ckpt.py --pth /path/epoch_1500.pth \
      --encoder_type Uformer --decoder_type Uformer --de_type 2tasks ... \
      --output_path /tmp/run/

Every flag after --pth/--import_epoch is the reference CLI surface
(config.py). The model flags MUST match the architecture the checkpoint
was trained with — mismatches abort with the offending parameter paths.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _numpyify(sd):
    import numpy as np

    out = {}
    for k, v in sd.items():
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                            else v)
    return out


def _strip(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _tree_paths(tree, base=""):
    if isinstance(tree, dict):
        out = []
        for k, v in tree.items():
            out.extend(_tree_paths(v, f"{base}/{k}"))
        return out
    return [base]


def _check_structure(name, got, want):
    gp, wp = set(_tree_paths(got)), set(_tree_paths(want))
    if gp == wp:
        return
    msg = [f"{name}: transplanted tree does not match the model's init tree"]
    missing = sorted(wp - gp)
    extra = sorted(gp - wp)
    if missing:
        msg.append("  model expects but checkpoint lacks: "
                   + ", ".join(missing[:8]) + (" ..." if len(missing) > 8 else ""))
    if extra:
        msg.append("  checkpoint provides but model lacks: "
                   + ", ".join(extra[:8]) + (" ..." if len(extra) > 8 else ""))
    msg.append("  (check --encoder_type/--decoder_type/--L/"
               "--degradation_embedding_method match the training run)")
    raise SystemExit("\n".join(msg))


def convert_state_dict(cfg, sd):
    """Flat reference state_dict (numpy values) -> (enc_vars, enc_k_vars,
    dec_vars, queue, queue_ptr). Pure mapping, no device work."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils import (
        torch_weights as tw)

    ep = "E.E." if any(k.startswith("E.E.") for k in sd) else "E."
    dp = "R.R." if any(k.startswith("R.R.") for k in sd) else "R."
    enc_sd = _strip(sd, ep + "encoder_q.")
    enc_k_sd = _strip(sd, ep + "encoder_k.")
    dec_sd = _strip(sd, dp)

    if cfg.encoder_type == "ResNet":
        conv = tw.resnet_encoder_from_torch
    elif cfg.encoder_type == "ViT":
        conv = tw.vit_encoder_from_torch
    elif cfg.encoder_type == "Uformer":
        conv = lambda s: tw.uformer_encoder_from_torch(
            s, L=cfg.L, msa_type=cfg.encoder_msa_type)
    else:
        raise SystemExit(f"unknown encoder_type {cfg.encoder_type}")
    enc_vars = conv(enc_sd)
    enc_k_vars = conv(enc_k_sd) if enc_k_sd else None

    if cfg.decoder_type == "ResNet":
        dec_vars = tw.dgrn_decoder_from_torch(
            dec_sd, groups=cfg.dgrn_groups, blocks=cfg.dgrn_blocks)
    elif cfg.decoder_type == "Uformer":
        from frequency_wised_all_in_one_image_restoration_model_tpu.models.decoder_uformer import (
            _band_config)
        all_num, all_dc, _, _ = _band_config(cfg)
        dec_vars = tw.uformer_decoder_from_torch(
            dec_sd, num_bands=all_num,
            learnable_modulator=cfg.learnable_modulator)
    else:
        raise SystemExit(f"unknown decoder_type {cfg.decoder_type}")

    return (enc_vars, enc_k_vars, dec_vars,
            sd.get(ep + "queue"), sd.get(ep + "queue_ptr"))


def import_checkpoint(cfg, sd, epoch):
    """Build a full TrainState around the transplanted weights and save it
    as ``<ckpt_path>/epoch_<epoch>``. Returns the checkpoint dir."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import (
        build_models)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training import (
        checkpoint as ckpt_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import (
        build_train_loader)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import (
        create_train_state)

    enc_vars, enc_k_vars, dec_vars, queue, queue_ptr = convert_state_dict(cfg, sd)

    # template state from a synthetic batch (shapes only — no dataset needed)
    cfg_synth = dataclasses.replace(cfg, synthetic_data=True)
    bundle = build_models(cfg_synth, eval_mode=False)
    loader = build_train_loader(cfg_synth, seed=cfg.seed)
    state = create_train_state(cfg_synth, bundle, jax.random.PRNGKey(cfg.seed),
                               loader.next_batch())

    enc_params = enc_vars["params"]
    enc_extra = {k: v for k, v in enc_vars.items() if k != "params"}
    dec_params = dec_vars["params"]
    dec_extra = {k: v for k, v in dec_vars.items() if k != "params"}
    _check_structure("encoder", enc_params, state.params["encoder"])
    _check_structure("decoder", dec_params, state.params["decoder"])
    _check_structure("encoder stats", enc_extra, state.extra["encoder"])

    params = {"encoder": enc_params, "decoder": dec_params}
    extra = {"encoder": enc_extra,
             "decoder": dec_extra if dec_extra else state.extra["decoder"]}

    moco = state.moco
    if enc_k_vars is not None:
        k_params = enc_k_vars["params"]
        k_extra = {k: v for k, v in enc_k_vars.items() if k != "params"}
        _check_structure("key encoder", k_params, moco.params_k)
        moco = moco.replace(params_k=k_params, extra_k=k_extra)
    if queue is not None:
        if tuple(queue.shape) == tuple(moco.queue.shape):
            moco = moco.replace(
                queue=np.asarray(queue, np.float32),
                queue_ptr=jnp.asarray(
                    int(np.asarray(queue_ptr).reshape(-1)[0]), jnp.int32))
        else:
            print(f"note: queue shape {tuple(queue.shape)} != ours "
                  f"{tuple(moco.queue.shape)} (different --de_type/batch) — "
                  "keeping a fresh queue")

    state = state.replace(params=params, extra=extra, moco=moco)
    path = ckpt_lib.save(cfg.ckpt_path, epoch, state)
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--import_epoch", type=int, default=None,
                    help="epoch number for the output dir (default: parsed "
                         "from the .pth filename, else --epochs)")
    own, rest = ap.parse_known_args(argv)

    from frequency_wised_all_in_one_image_restoration_model_tpu import (
        config as config_lib)
    cfg = config_lib.parse_args(rest)

    import torch

    raw = torch.load(own.pth, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "net" in raw and isinstance(raw["net"], dict):
        raw = raw["net"]  # the multi-GPU checkpoint wrapper (train.py:121-125)
    sd = _numpyify(raw)

    epoch = own.import_epoch
    if epoch is None:
        m = re.search(r"epoch_(\d+)", os.path.basename(own.pth))
        epoch = int(m.group(1)) if m else cfg.epochs

    path = import_checkpoint(cfg, sd, epoch)
    print("wrote", path)
    print(f"evaluate with: python test.py --output_path {cfg.output_path} "
          f"--epochs {epoch} <same model flags>")


if __name__ == "__main__":
    main()
