"""AirNet composition: degradation encoder (MoCo) + restoration decoder.

Capability match for reference ``net/model.py:13-71`` (Decoder/Encoder
wrappers + AirNet), functional-style: modules are selected from the config
(the reference uses ``globals()[opt.encoder_type+'Encoder']``, model.py:17,31)
and the train/eval forward semantics (train returns restored+logits, eval
feeds ``x_query`` as both MoCo inputs) live in pure functions over explicit
state rather than an ``nn.Module.training`` flag.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from .decoder_dgrn import DGRN
from .encoder_resnet import ResNetEncoder


def effective_num_losses(cfg: Config) -> int:
    """Number of per-band contrastive losses.

    The reference loops ``opt.L`` regardless of the encoder (moco.py:20,127)
    and indexes out of range for single-band encoders; here the count follows
    what the encoder emits: L for Uformer, 1 for ResNet/ViT (PARITY.md).
    """
    return cfg.L if cfg.encoder_type == "Uformer" else 1


def model_dtype(cfg: Config, eval_mode: bool = False) -> jnp.dtype:
    name = cfg.eval_dtype if eval_mode else cfg.dtype
    return {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
            "float32": jnp.float32, "fp32": jnp.float32}[name]


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """Encoder + decoder modules plus the glue the train/eval steps need."""

    # NOTE: for eval bundles, cfg is NOT the caller's config verbatim —
    # build_models forces remat=False on it (see below), so never reuse an
    # eval bundle's cfg to build a train step (ADVICE r3)
    cfg: Config
    encoder: Any
    decoder: Any
    num_losses: int

    # -- uniform apply helpers -------------------------------------------
    def encode(self, variables, x, train: bool, rngs=None, mutable=False):
        """Returns ``((fea, out[num_losses,B,dim], inter), new_mutable?)``."""
        return self.encoder.apply(variables, x, train=train, rngs=rngs,
                                  mutable=mutable)

    def decode(self, variables, x, inter, train: bool, rngs=None):
        return self.decoder.apply(variables, x, inter, train=train, rngs=rngs)




def build_models(cfg: Config, eval_mode: bool = False) -> ModelBundle:
    """Select encoder/decoder classes by config (reference model.py:17,31)."""
    dtype = model_dtype(cfg, eval_mode)
    if eval_mode and cfg.remat:
        # remat only pays in the backward (jax.checkpoint is the identity
        # for a forward-only trace) but remat_tile_headroom() would halve
        # the fused kernels' row-tile budgets at trace time — never let an
        # eval build pay that
        cfg = dataclasses.replace(cfg, remat=False)

    if cfg.encoder_type == "ResNet":
        encoder = ResNetEncoder(dim=cfg.encoder_dim, dtype=dtype)
    elif cfg.encoder_type == "ViT":
        from .encoder_vit import ViTEncoder
        encoder = ViTEncoder(cfg=cfg, image_size=cfg.patch_size, dtype=dtype)
    elif cfg.encoder_type == "Uformer":
        from .encoder_uformer import UformerEncoder
        encoder = UformerEncoder(cfg=cfg, img_size=cfg.patch_size,
                                 drop_path_rate=cfg.drop_path,
                                 dtype=dtype)
    else:
        raise ValueError(cfg.encoder_type)

    if cfg.decoder_type == "ResNet":
        # DGRN; n_feats per reference decoder_DGRN.py:120-124
        n_feats = (cfg.encoder_dim // 4 if cfg.encoder_type == "ResNet"
                   else cfg.encoder_dim)
        decoder = DGRN(n_feats=n_feats, n_groups=cfg.dgrn_groups,
                       n_blocks=cfg.dgrn_blocks, dtype=dtype)
    elif cfg.decoder_type == "Uformer":
        from .decoder_uformer import UformerDecoder
        decoder = UformerDecoder(cfg=cfg, img_size=cfg.patch_size,
                                 drop_path_rate=cfg.drop_path,
                                 dtype=dtype)
    else:
        raise ValueError(cfg.decoder_type)

    return ModelBundle(cfg=cfg, encoder=encoder, decoder=decoder,
                       num_losses=effective_num_losses(cfg))


def eval_forward(bundle: ModelBundle, enc_vars, dec_vars, x: jax.Array) -> jax.Array:
    """Eval AirNet forward: encoder(x) -> inter -> decoder(x, inter)
    (reference model.py:66-70: eval feeds x_query as both MoCo inputs, and
    MoCo eval mode only runs encoder_q, moco.py:167-170)."""
    _, _, inter = bundle.encode(enc_vars, x, train=False)
    return bundle.decode(dec_vars, x, inter, train=False)
