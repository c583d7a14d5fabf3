"""PyTorch-checkpoint interop: reference ``state_dict`` -> Flax variables.

SURVEY.md §5.4 deliverable: a documented weight-name mapping so reference
checkpoints can be loaded for parity validation (and users can migrate).
Covered: the ResNet degradation encoder (encoder_ResNet.py), the SFT layer
(decoder_DGRN.py:35-57), and the ViT encoder (encoder_ViT.py). The Uformer
pair's mapping follows the same conventions (documented below) but the
reference modules cannot even be instantiated in this environment (they
import ``timm`` at module scope), so its transplant is exercised only by
name-shape audits.

Tensor conventions:
  torch Conv2d weight  [out, in, kh, kw]  ->  flax kernel [kh, kw, in, out]
  torch Linear weight  [out, in]          ->  flax kernel [in, out]
  torch BatchNorm2d    weight/bias        ->  flax scale/bias
                       running_mean/var   ->  batch_stats mean/var
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def conv_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 1, 0)


def linear_w(t) -> np.ndarray:
    return np.asarray(t).T


def _bn(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": np.asarray(sd[prefix + ".weight"]),
              "bias": np.asarray(sd[prefix + ".bias"])}
    stats = {"mean": np.asarray(sd[prefix + ".running_mean"]),
             "var": np.asarray(sd[prefix + ".running_var"])}
    return params, stats


def resblock_from_torch(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    """Reference ResBlock (encoder_ResNet.py:4-17): backbone Sequential
    [Conv, BN, LReLU, Conv, BN] + shortcut [Conv, BN] -> our ResBlock
    (Conv_0/BatchNorm_0, Conv_1/BatchNorm_1, Conv_2/BatchNorm_2)."""
    p, s = {}, {}
    p["Conv_0"] = {"kernel": conv_w(sd[prefix + ".backbone.0.weight"])}
    bn0, st0 = _bn(sd, prefix + ".backbone.1")
    p["BatchNorm_0"], s["BatchNorm_0"] = bn0, st0
    p["Conv_1"] = {"kernel": conv_w(sd[prefix + ".backbone.3.weight"])}
    bn1, st1 = _bn(sd, prefix + ".backbone.4")
    p["BatchNorm_1"], s["BatchNorm_1"] = bn1, st1
    p["Conv_2"] = {"kernel": conv_w(sd[prefix + ".shortcut.0.weight"])}
    bn2, st2 = _bn(sd, prefix + ".shortcut.1")
    p["BatchNorm_2"], s["BatchNorm_2"] = bn2, st2
    return p, s


def resnet_encoder_from_torch(sd: Mapping) -> Dict[str, Any]:
    """Reference ResNetEncoder state_dict -> our ResNetEncoder variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["E_pre"], stats["E_pre"] = resblock_from_torch(sd, "E_pre")
    params["ResBlock_0"], stats["ResBlock_0"] = resblock_from_torch(sd, "E.0")
    params["ResBlock_1"], stats["ResBlock_1"] = resblock_from_torch(sd, "E.1")
    params["Dense_0"] = {"kernel": linear_w(sd["mlp.0.weight"]),
                         "bias": np.asarray(sd["mlp.0.bias"])}
    params["Dense_1"] = {"kernel": linear_w(sd["mlp.2.weight"]),
                         "bias": np.asarray(sd["mlp.2.bias"])}
    return {"params": params, "batch_stats": stats}


def sft_layer_from_torch(sd: Mapping, prefix: str = "") -> Dict[str, Any]:
    """Reference SFT_layer (decoder_DGRN.py:35-47) -> our SFTLayer params."""
    g = lambda k: conv_w(sd[prefix + k])
    return {"params": {
        "conv_gamma_0": {"kernel": g("conv_gamma.0.weight")},
        "conv_gamma_1": {"kernel": g("conv_gamma.2.weight")},
        "conv_beta_0": {"kernel": g("conv_beta.0.weight")},
        "conv_beta_1": {"kernel": g("conv_beta.2.weight")},
    }}


def vit_encoder_from_torch(sd: Mapping, depth: int = 12) -> Dict[str, Any]:
    """Reference ViTEncoder state_dict -> our ViTEncoder variables.

    Reference names (encoder_ViT.py): to_patch_embedding.{1,2,3},
    pos_embedding, transformer.layers.{i}.{0,1}.{norm,fn.*}, mlp_head.{0,1},
    norm.0 (BatchNorm2d), mlp.{0,2}.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["patch_norm1"] = {
        "scale": np.asarray(sd["to_patch_embedding.1.weight"]),
        "bias": np.asarray(sd["to_patch_embedding.1.bias"])}
    params["patch_embed"] = {
        "kernel": linear_w(sd["to_patch_embedding.2.weight"]),
        "bias": np.asarray(sd["to_patch_embedding.2.bias"])}
    params["patch_norm2"] = {
        "scale": np.asarray(sd["to_patch_embedding.3.weight"]),
        "bias": np.asarray(sd["to_patch_embedding.3.bias"])}
    params["pos_embedding"] = np.asarray(sd["pos_embedding"])

    for i in range(depth):
        base = f"transformer.layers.{i}"
        params[f"norm_attn_{i}"] = {
            "scale": np.asarray(sd[f"{base}.0.norm.weight"]),
            "bias": np.asarray(sd[f"{base}.0.norm.bias"])}
        attn = {"to_qkv": {"kernel": linear_w(sd[f"{base}.0.fn.to_qkv.weight"])},
                "to_out": {"kernel": linear_w(sd[f"{base}.0.fn.to_out.0.weight"]),
                           "bias": np.asarray(sd[f"{base}.0.fn.to_out.0.bias"])}}
        if f"{base}.0.fn.lamb" in sd:
            attn["lamb"] = np.asarray(sd[f"{base}.0.fn.lamb"])
        params[f"attn_{i}"] = attn
        params[f"norm_ff_{i}"] = {
            "scale": np.asarray(sd[f"{base}.1.norm.weight"]),
            "bias": np.asarray(sd[f"{base}.1.norm.bias"])}
        params[f"ff_{i}_0"] = {
            "kernel": linear_w(sd[f"{base}.1.fn.net.0.weight"]),
            "bias": np.asarray(sd[f"{base}.1.fn.net.0.bias"])}
        params[f"ff_{i}_1"] = {
            "kernel": linear_w(sd[f"{base}.1.fn.net.3.weight"]),
            "bias": np.asarray(sd[f"{base}.1.fn.net.3.bias"])}

    params["mlp_head_norm"] = {"scale": np.asarray(sd["mlp_head.0.weight"]),
                               "bias": np.asarray(sd["mlp_head.0.bias"])}
    params["mlp_head_dense"] = {"kernel": linear_w(sd["mlp_head.1.weight"]),
                                "bias": np.asarray(sd["mlp_head.1.bias"])}
    bn, st = _bn(sd, "norm.0")
    params["norm"], stats["norm"] = bn, st
    params["mlp_0"] = {"kernel": linear_w(sd["mlp.0.weight"]),
                       "bias": np.asarray(sd["mlp.0.bias"])}
    params["mlp_1"] = {"kernel": linear_w(sd["mlp.2.weight"]),
                       "bias": np.asarray(sd["mlp.2.bias"])}
    return {"params": params, "batch_stats": stats}
