"""PyTorch-checkpoint interop: reference ``state_dict`` -> Flax variables.

SURVEY.md §5.4 deliverable: a documented weight-name mapping so reference
checkpoints can be loaded for parity validation (and users can migrate).
Covered: the ResNet degradation encoder (encoder_ResNet.py), the SFT layer
(decoder_DGRN.py:35-57), the ViT encoder (encoder_ViT.py), and the Uformer
encoder/decoder pair (encoder_Uformer.py:746-986,
decoder_Uformer.py:835-1171) — instantiate the reference modules with
``utils.timm_shim.install()`` first (they import timm at module scope).

Tensor conventions:
  torch Conv2d weight        [out, in, kh, kw] -> flax kernel [kh, kw, in, out]
  torch ConvTranspose2d      [in, out, kh, kw] -> flax ConvTranspose kernel
                             [kh, kw, in, out] with the taps SPATIALLY
                             FLIPPED (torch convT correlates the un-flipped
                             kernel; lax.conv_transpose convolves)
  torch Linear weight        [out, in]         -> flax kernel [in, out]
  torch BatchNorm2d          weight/bias       -> flax scale/bias
                             running_mean/var  -> batch_stats mean/var
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


def deconv_w(t) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] -> flax [kh, kw, in, out],
    spatially flipped (see module docstring)."""
    a = np.asarray(t)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(a.transpose(2, 3, 0, 1))


def _ln(sd: Mapping, p: str) -> Dict:
    return {"scale": np.asarray(sd[p + ".weight"]),
            "bias": np.asarray(sd[p + ".bias"])}


def _linear(sd: Mapping, p: str) -> Dict:
    out = {"kernel": linear_w(sd[p + ".weight"])}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _conv(sd: Mapping, p: str) -> Dict:
    out = {"kernel": conv_w(sd[p + ".weight"])}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


# ---------------------------------------------------------------------------
# Uformer pair (encoder_Uformer.py:746-986, decoder_Uformer.py:835-1171)
# ---------------------------------------------------------------------------


def _leff(sd: Mapping, p: str) -> Dict:
    """Reference LeFF (leff.py:71-117): linear1.0 / conv.0 (depthwise) /
    linear2.0 -> our LeFF {linear1, dwconv, linear2}."""
    return {"linear1": _linear(sd, p + ".linear1.0"),
            "dwconv": _conv(sd, p + ".conv.0"),
            "linear2": _linear(sd, p + ".linear2.0")}


def _qkv(sd: Mapping, p: str, kv_source=None) -> Dict:
    """LinearProjection (decoder_Uformer.py:80-96): kv_source='attention_kv'
    splits the kv projection into to_k/to_v over the encoder's K/V dim."""
    out = {"to_q": _linear(sd, p + ".to_q")}
    if kv_source == "attention_kv":
        out["to_k"] = _linear(sd, p + ".to_k")
        out["to_v"] = _linear(sd, p + ".to_v")
    else:
        out["to_kv"] = _linear(sd, p + ".to_kv")
    return out


def _sepconv(sd: Mapping, p: str) -> Dict:
    """Reference SepConv2d (encoder_Uformer.py:16-43): depthwise 3x3 +
    pointwise 1x1; the torch depthwise weight [C,1,kh,kw] maps straight
    through :func:`conv_w`."""
    return {"depthwise": _conv(sd, p + ".depthwise"),
            "pointwise": _conv(sd, p + ".pointwise")}


def conv_projection_from_torch(sd: Mapping, prefix: str = "") -> Dict:
    """Reference ConvProjection (encoder_Uformer.py:47-76) -> our
    ConvProjection params (three SepConv2d branches)."""
    p = prefix.rstrip(".")
    dot = p + "." if p else ""
    return {name: _sepconv(sd, dot + name)
            for name in ("to_q", "to_k", "to_v")}


def _attn_origin(sd: Mapping, p: str, num_bands=None,
                 kv_source=None) -> Dict:
    """WindowAttention (encoder_Uformer.py:103-186 / the decoder flavor
    decoder_Uformer.py:128-299 incl. the embed_lamb heads mlp_head.{i}/
    mlp.{i} -> lamb_norm_{i}/lamb_head_{i}/lamb_mlp_{i}_{0,1})."""
    out = {"qkv": _qkv(sd, p + ".qkv", kv_source),
           "relative_position_bias_table":
               np.asarray(sd[p + ".relative_position_bias_table"]),
           "proj": _linear(sd, p + ".proj")}
    for i in range(1, num_bands or 0):
        out[f"lamb_norm_{i}"] = _ln(sd, f"{p}.mlp_head.{i}.0")
        out[f"lamb_head_{i}"] = _linear(sd, f"{p}.mlp_head.{i}.1")
        out[f"lamb_mlp_{i}_0"] = _linear(sd, f"{p}.mlp.{i}.0")
        out[f"lamb_mlp_{i}_1"] = _linear(sd, f"{p}.mlp.{i}.2")
    return out


def _attn_freq(sd: Mapping, p: str, L: int) -> Dict:
    """FrequencyWindowAttention (encoder_Uformer.py:190-313): the L*L
    ParameterList entries stack into one [L*L, (2w-1)^2, h] table."""
    tables = np.stack([
        np.asarray(sd[f"{p}.relative_position_bias_table.{i}"])
        for i in range(L * L)])
    return {"qkv": _qkv(sd, p + ".qkv"),
            "relative_position_bias_tables": tables,
            "proj": _linear(sd, p + ".proj")}


def _lewin_block(sd: Mapping, p: str, msa: str, L: int,
                 num_bands=None, modulator: bool = False,
                 self_modulator: bool = False,
                 methods: tuple = ()) -> Dict:
    """``methods``: per-scale degradation-injection methods whose params
    live inside the block — 'modulator' (decoder_Uformer.py:541-548),
    'attention_residual' (:569-573) and 'attention_kv' (:218-224, via the
    qkv projection split). 'self_modulator' keeps its dedicated kwarg."""
    if self_modulator or "self_modulator" in methods:
        self_modulator = True
    if self_modulator:
        # norm1/2 are SelfModulatedLayerNorms + degradation pre-norms
        # (decoder_Uformer.py:560-567, 587-594)
        sml = lambda q: {"mlp_gamma": _linear(sd, q + ".mlp_gamma"),
                         "mlp_beta": _linear(sd, q + ".mlp_beta")}
        out = {"norm1": sml(p + ".norm1"),
               "norm1_deg_norm": _ln(sd, p + ".norm1_norm_degradation.0"),
               "norm2": sml(p + ".norm2"),
               "norm2_deg_norm": _ln(sd, p + ".norm2_norm_degradation.0"),
               "mlp": _leff(sd, p + ".mlp")}
    else:
        out = {"norm1": _ln(sd, p + ".norm1"),
               "norm2": _ln(sd, p + ".norm2"),
               "mlp": _leff(sd, p + ".mlp")}
    if msa == "freq":
        out["attn_intra"] = _attn_freq(sd, p + ".attn_intra", L)
        out["attn_inter"] = _attn_freq(sd, p + ".attn_inter", L)
    else:
        kv_source = ("attention_kv" if "attention_kv" in methods else
                     "attention_residual" if "attention_residual" in methods
                     else None)
        out["attn"] = _attn_origin(sd, p + ".attn", num_bands, kv_source)
    if "modulator" in methods:
        # degradation map -> win x win modulator tokens, concat-embedded
        # (decoder_Uformer.py:541-548)
        out["degradation_modulator"] = {
            "conv": _conv(sd, p + ".degradation_modulator.conv.0")}
        out["degradation_modulator_norm"] = _ln(
            sd, p + ".norm_degradation_modulator.0")
        out["degradation_modulator_embed"] = _linear(
            sd, p + ".degradation_modulator_embed")
    if "attention_residual" in methods:
        out["attn_deg_norm"] = _ln(sd, p + ".norm_degradation_attention.0")
    if modulator:
        out["modulator"] = np.asarray(sd[p + ".modulator.weight"])
    return out


def _stage(sd: Mapping, p: str, depth: int, msa: str = "origin", L: int = 1,
           num_bands=None, modulator: bool = False) -> Dict:
    return {f"block{j}": _lewin_block(sd, f"{p}.blocks.{j}", msa, L,
                                      num_bands, modulator)
            for j in range(depth)}


def uformer_encoder_from_torch(sd: Mapping, L: int,
                               msa_type: str) -> Dict[str, Any]:
    """Reference UformerEncoder state_dict -> our UformerEncoder variables.

    Names: uformer.input_proj/encoderlayer_{i}/dowsample_{i}/conv (the
    bottleneck) + per-band heads mlp_head.{i}/norm.{i}/mlp.{i}
    (encoder_Uformer.py:926-957)."""
    depths = (2, 2, 2, 2, 2)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["input_proj"] = {"proj": _conv(sd, "uformer.input_proj.proj.0")}
    for i in range(4):
        params[f"encoderlayer_{i}"] = _stage(
            sd, f"uformer.encoderlayer_{i}", depths[i], msa_type, L)
        params[f"dowsample_{i}"] = {
            "conv": _conv(sd, f"uformer.dowsample_{i}.conv.0")}
    params["bottleneck"] = _stage(sd, "uformer.conv", depths[4], msa_type, L)
    for i in range(L):
        params[f"mlp_head_{i}_norm"] = _ln(sd, f"mlp_head.{i}.0")
        params[f"mlp_head_{i}_dense"] = _linear(sd, f"mlp_head.{i}.1")
        bn, st = _bn(sd, f"norm.{i}.0")
        params[f"norm_{i}"], stats[f"norm_{i}"] = bn, st
        params[f"mlp_{i}_0"] = _linear(sd, f"mlp.{i}.0")
        params[f"mlp_{i}_1"] = _linear(sd, f"mlp.{i}.2")
    return {"params": params, "batch_stats": stats}


def uformer_decoder_from_torch(sd: Mapping, num_bands=None,
                               learnable_modulator: bool = False
                               ) -> Dict[str, Any]:
    """Reference UformerDecoder state_dict -> our UformerDecoder variables.

    Names: input_proj/output_proj/encoderlayer_{i}/dowsample_{i}/
    bottleneck_{0,1}/upsample_{s}/decoderlayer_{s}
    (decoder_Uformer.py:888-1101). The ``residual`` method's Linears are NOT
    in the reference state_dict (built in a plain list, decoder_Uformer.py:
    883-885 — PARITY.md #4), so they cannot be transplanted."""
    depths = (2, 2, 8, 8, 2, 8, 8, 2, 2)  # decoder_Uformer.py:837
    params: Dict[str, Any] = {}
    params["input_proj"] = {"proj": _conv(sd, "input_proj.proj.0")}
    params["output_proj"] = {"proj": _conv(sd, "output_proj.proj.0")}
    for i in range(4):
        params[f"encoderlayer_{i}"] = _stage(
            sd, f"encoderlayer_{i}", depths[i], num_bands=num_bands)
        params[f"dowsample_{i}"] = {
            "conv": _conv(sd, f"dowsample_{i}.conv.0")}
    params["bottleneck_0"] = _stage(sd, "bottleneck_0", depths[4],
                                    num_bands=num_bands)
    params["bottleneck_1"] = _stage(sd, "bottleneck_1", depths[4],
                                    num_bands=num_bands)
    for s, di in [(3, 5), (2, 6), (1, 7), (0, 8)]:
        dk = {"kernel": deconv_w(sd[f"upsample_{s}.deconv.0.weight"])}
        if f"upsample_{s}.deconv.0.bias" in sd:
            dk["bias"] = np.asarray(sd[f"upsample_{s}.deconv.0.bias"])
        params[f"upsample_{s}"] = {"deconv": dk}
        params[f"decoderlayer_{s}"] = _stage(
            sd, f"decoderlayer_{s}", depths[di], num_bands=num_bands,
            modulator=learnable_modulator)
    return {"params": params}


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


def _dgrn_conv(sd: Mapping, p: str) -> Dict[str, np.ndarray]:
    d = {"kernel": conv_w(sd[p + ".weight"])}
    if p + ".bias" in sd:
        d["bias"] = np.asarray(sd[p + ".bias"])
    return d


def _dgrn_dcn(sd: Mapping, p: str) -> Dict[str, Any]:
    """Reference DCN_layer (net/utils/deform_conv.py:10-50) -> our DCNLayer.

    Our module stores the sampling weight SHIFTED by +stdv (the init trick
    ``uniform(0, 2s) - s``, models/decoder_dgrn.py:59-62), so the stored
    param is the torch weight plus ``1/sqrt(cin*k*k)``.
    """
    w = conv_w(sd[p + ".weight"])                   # [k, k, cin, out]
    k, _, cin, _ = w.shape
    stdv = 1.0 / np.sqrt(cin * k * k)
    out: Dict[str, Any] = {
        "weight": (w + stdv).astype(np.float32),
        "conv_offset_mask": _dgrn_conv(sd, p + ".conv_offset_mask"),
    }
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _dgrn_dgm(sd: Mapping, p: str) -> Dict[str, Any]:
    return {"dcn": _dgrn_dcn(sd, p + ".dcn"),
            "sft": sft_layer_from_torch(sd, p + ".sft.")["params"]}


def _dgrn_dgb(sd: Mapping, p: str) -> Dict[str, Any]:
    return {"dgm1": _dgrn_dgm(sd, p + ".dgm1"),
            "dgm2": _dgrn_dgm(sd, p + ".dgm2"),
            "conv1": _dgrn_conv(sd, p + ".conv1"),
            "conv2": _dgrn_conv(sd, p + ".conv2")}


def dgrn_decoder_from_torch(sd: Mapping, groups: int = 5,
                            blocks: int = 5) -> Dict[str, Any]:
    """Reference DGRN decoder state_dict -> our DGRN variables.

    Names (decoder_DGRN.py:113-142): ``head.0``, ``body.{g}`` a DGG for
    g < groups whose ``body.{i}`` is a DGB for i < blocks and ``body.{blocks}``
    the group conv, ``body.{groups}`` the trunk conv, ``tail.0``. The
    reference ships this decoder's DCN forward as ``assert False``
    (net/utils/deform_conv.py:64) so no reference-side numeric golden is
    possible; SFT and DCN numerics are pinned by their own parity tests.
    """
    params: Dict[str, Any] = {"head": _dgrn_conv(sd, "head.0"),
                              "tail": _dgrn_conv(sd, "tail.0")}
    for g in range(groups):
        dgg: Dict[str, Any] = {
            f"dgb{i}": _dgrn_dgb(sd, f"body.{g}.body.{i}")
            for i in range(blocks)}
        dgg["conv"] = _dgrn_conv(sd, f"body.{g}.body.{blocks}")
        params[f"dgg{g}"] = dgg
    params["body_conv"] = _dgrn_conv(sd, f"body.{groups}")
    return {"params": params}
