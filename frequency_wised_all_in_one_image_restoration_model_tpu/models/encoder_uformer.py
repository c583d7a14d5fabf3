"""Uformer contrastive degradation encoder (encoder-half + band heads).

Capability match for reference ``net/encoder_Uformer.py:746-986``:
InputProj -> 4 x (stage + 4x4/s2 conv downsample) -> bottleneck stage, with
the paper's frequency-wise preprocessing — the input split into L FFT bands
folded into the batch ``(l b) h w c`` (encoder_Uformer.py:934-935, 964-966) —
and per-band contrastive heads (giant ``mlp_head`` Linear -> reshape ->
BatchNorm -> avgpool -> MLP, :940-957, 973-984).

Output contract (richer than the reference's — see PARITY.md):
``(fea=None, out [L, B, encoder_dim], DegradationContext)`` where the context
carries

* ``band_inter``: L x [B, (P/16)^2, ed*16] per-band bottleneck features —
  what the reference returns as ``inter`` (:969-971) and the decoder's
  ``all_*`` methods consume;
* ``pyramid``: 5 per-scale feature maps (band-0 slice) — the per-scale
  degradation tensors the reference's decoder smoke test documents
  (decoder_Uformer.py:1194-1201) but the shipped forward never wires
  (it passes ``None``, decoder_Uformer.py:1124); these make ``residual`` /
  ``modulator`` / ``self_modulator`` / ``deform_conv`` /
  ``attention_residual`` actually work;
* ``kv``: per-scale last-block (K, V) for ``attention_kv`` (the return the
  reference computes then comments out, encoder_Uformer.py:923).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..config import Config
from ..ops import frequency
from .layers import leaky_relu, trunc_normal_init
from .uformer_blocks import Downsample, InputProj
from .uformer_lewin import BasicUformerLayer


class DegradationContext(struct.PyTreeNode):
    """Everything the decoder can condition on."""

    band_inter: Tuple[jax.Array, ...]            # L x [B, N16, ed*16]
    pyramid: Optional[Tuple[jax.Array, ...]]     # 5 x [B, N_s, ed*2^s]
    kv: Optional[Tuple[Any, ...]]                # 5 x (K, V) or None


ENCODER_DEPTHS = (2, 2, 2, 2, 2)        # encoder_Uformer.py:748 (first 5 used)
ENCODER_HEADS = (1, 2, 4, 8, 16)


class UformerEncoder(nn.Module):
    cfg: Config
    img_size: int = 128
    in_chans: int = 3
    drop_path_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        L = cfg.L
        ed = cfg.encoder_embed_dim
        b = x.shape[0]
        p = x.shape[1]
        need_kv = "attention_kv" in cfg.degradation_embedding_method
        det = not train

        # ---- frequency-band preprocessing: L bands folded into batch
        if L != 1:
            nchw = x.transpose(0, 3, 1, 2)
            bands = frequency.frequency_decompose_1(nchw, L - 1)  # [L,B,C,H,W]
            x = bands.transpose(0, 1, 3, 4, 2).reshape(L * b, p, p, -1)
            x = x.astype(self.dtype)

        tokens = InputProj(ed, dtype=self.dtype, name="input_proj")(x)

        # stochastic depth ramp (encoder_Uformer.py:781-783)
        import numpy as np
        depths = ENCODER_DEPTHS
        if cfg.uformer_depth_cap is not None:  # test/dryrun shrink knob
            depths = tuple(min(d, cfg.uformer_depth_cap) for d in depths)
        total = sum(depths[:4])
        ramp = list(np.linspace(0.0, self.drop_path_rate, total))
        conv_dpr = [self.drop_path_rate] * depths[4]

        def stage(i, dim, res, depth, heads, dpr):
            return BasicUformerLayer(
                dim=dim, input_resolution=res, depth=depth, num_heads=heads,
                win_size=8, drop_path=dpr, msa_type=cfg.encoder_msa_type,
                L=L, need_kv=need_kv, dtype=self.dtype, remat=cfg.remat,
                name=f"encoderlayer_{i}" if i < 4 else "bottleneck")

        feats, kvs = [], []
        y = tokens
        used = 0
        for i in range(4):
            depth = depths[i]
            y, kv = stage(i, ed * (2 ** i), p // (2 ** i), depth,
                          ENCODER_HEADS[i], ramp[used:used + depth])(
                              y, deterministic=det)
            feats.append(y)
            kvs.append(kv)
            y = Downsample(ed * (2 ** (i + 1)), dtype=self.dtype,
                           name=f"dowsample_{i}")(y)
            used += depth
        y, kv = stage(4, ed * 16, p // 16, depths[4],
                      ENCODER_HEADS[4], conv_dpr)(y, deterministic=det)
        feats.append(y)
        kvs.append(kv)

        # ---- un-fold the band axis: L x [B, N16, ed*16]
        n16 = (p // 16) ** 2
        if L != 1:
            bands16 = y.reshape(L, b, n16, ed * 16)
            band_inter = tuple(bands16[i] for i in range(L))
            # per-scale pyramid: band 0 (DC) slice of each stage's features
            pyramid = tuple(
                f.reshape(L, b, *f.shape[1:])[0] for f in feats)
            kv_out = None
            if need_kv:
                # 'origin' MSA folds L into the BATCH of K/V; slice band 0.
                # 'freq' MSA regroups L into the TOKEN axis (K/V are
                # [B*nW, h, L*win^2, hd]) — pass through whole; the decoder's
                # ratio-tiled bias/mask handle the longer KV
                # (encoder_Uformer.py:161-169 is exactly this mechanism).
                if cfg.encoder_msa_type == "origin":
                    kv_out = tuple(
                        tuple(t.reshape(L, -1, *t.shape[1:])[0] for t in kv_i)
                        if kv_i is not None else None
                        for kv_i in kvs)
                else:
                    kv_out = tuple(kvs)
        else:
            band_inter = (y,)
            pyramid = tuple(feats)
            kv_out = tuple(kvs) if need_kv else None

        # ---- per-band contrastive heads (encoder_Uformer.py:973-984)
        outs = []
        for i in range(L):
            fea = nn.LayerNorm(dtype=jnp.float32, name=f"mlp_head_{i}_norm")(
                band_inter[i].astype(jnp.float32)).astype(self.dtype)
            fea = nn.Dense(cfg.encoder_dim * 16 * 16,
                           kernel_init=trunc_normal_init, dtype=self.dtype,
                           name=f"mlp_head_{i}_dense")(fea)
            # [B, N16, dim*256] -> [B, dim, P, P] (row-major relabel,
            # encoder_Uformer.py:978) -> NHWC for BatchNorm
            fea = fea.reshape(b, cfg.encoder_dim, p, p).transpose(0, 2, 3, 1)
            fea = nn.BatchNorm(use_running_average=det, momentum=0.9,
                               epsilon=1e-5, dtype=jnp.float32,
                               name=f"norm_{i}")(fea)
            fea = leaky_relu(fea)
            fea = jnp.mean(fea, axis=(1, 2))  # avgpool -> [B, dim]
            fea = nn.Dense(cfg.encoder_dim, dtype=self.dtype,
                           name=f"mlp_{i}_0")(fea)
            fea = leaky_relu(fea)
            fea = nn.Dense(cfg.encoder_dim, dtype=self.dtype,
                           name=f"mlp_{i}_1")(fea)
            outs.append(fea.astype(jnp.float32))

        out = jnp.stack(outs, axis=0)  # [L, B, encoder_dim]
        ctx = DegradationContext(band_inter=band_inter, pyramid=pyramid,
                                 kv=kv_out)
        return None, out, ctx
