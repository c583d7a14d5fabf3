"""ViT contrastive degradation encoder with attention-map band modulation.

Capability match for reference ``net/encoder_ViT.py:119-203`` (lucidrains-
style ViT): 16x16 patch embed, learned positional embedding, depth-12
transformer whose attention maps are optionally FFT-ring decomposed and
re-added with learnable per-band/per-head gains ``lamb``
(encoder_ViT.py:51-65, 84-92; per-batch-slot gains with
``batch_wise_decompose``), then an ``mlp_head`` re-projecting tokens to a
spatial ``[B, H, W, encoder_dim]`` degradation map ``inter``
(:193-197).

Note: the reference constructs the decomposition with ``h=w=dim_head``
(encoder_ViT.py:56), which only matches the attention map because
``dim_head == num_patches == 64`` in its default geometry; here the FFT size
is the token count (the actual attention-map side), which is the same number
in the reference configuration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops import frequency
from .layers import leaky_relu, trunc_normal_init


class ViTAttention(nn.Module):
    dim: int
    heads: int
    dropout: float = 0.1
    decompose_type: str = "none"   # 'N_bands' | 'DC' | 'none'
    wised_batch: int = 0           # >0 -> per-batch-slot lamb
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, _ = x.shape
        h = self.heads
        dim_head = self.dim // h
        inner = h * dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(b, n, h, dim_head).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        scale = dim_head ** -0.5
        logits = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale,
                            k.astype(jnp.float32))
        attn = jax.nn.softmax(logits, axis=-1)

        if self.decompose_type != "none":
            if self.decompose_type == "DC":
                bands = frequency.frequency_decompose_dc(attn)
            else:
                nb = int(self.decompose_type.split("_")[0])
                bands = frequency.frequency_decompose(attn, nb)
            lamb = self.param(
                "lamb", nn.initializers.zeros,
                (bands.shape[0], self.wised_batch or 1, h), jnp.float32)
            # ViT variant scales ALL bands including band 0
            # (encoder_ViT.py:90-92)
            attn = attn + jnp.sum(bands * lamb[:, :, :, None, None], axis=0)

        attn = nn.Dropout(self.dropout, deterministic=deterministic,
                          name="attn_drop")(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(self.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, kernel_init=trunc_normal_init,
                       dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic,
                          name="out_drop")(out)


class ViTEncoder(nn.Module):
    cfg: Config
    image_size: int = 128
    patch: int = 16
    depth: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        det = not train
        b, hh, ww, c = x.shape
        pp = self.patch
        dim = cfg.out_channels * pp * pp  # encoder_ViT.py:134
        n = (hh // pp) * (ww // pp)

        # patch embed: 'b (h p1) (w p2) c -> b (h w) (p1 p2 c)'
        patches = x.reshape(b, hh // pp, pp, ww // pp, pp, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, n, pp * pp * c)
        y = nn.LayerNorm(dtype=jnp.float32, name="patch_norm1")(patches)
        y = nn.Dense(dim, kernel_init=trunc_normal_init, dtype=self.dtype,
                     name="patch_embed")(y.astype(self.dtype))
        y = nn.LayerNorm(dtype=jnp.float32, name="patch_norm2")(y).astype(self.dtype)

        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n, dim), jnp.float32)
        y = y + pos.astype(self.dtype)
        y = nn.Dropout(self.dropout, deterministic=det, name="emb_drop")(y)

        wised = cfg.batch_size if cfg.batch_wise_decompose else 0
        for i in range(self.depth):
            a = nn.LayerNorm(dtype=jnp.float32, name=f"norm_attn_{i}")(y)
            y = y + ViTAttention(dim, self.heads, self.dropout,
                                 decompose_type=cfg.frequency_decompose_type,
                                 wised_batch=wised, dtype=self.dtype,
                                 name=f"attn_{i}")(
                                     a.astype(self.dtype), deterministic=det)
            f = nn.LayerNorm(dtype=jnp.float32, name=f"norm_ff_{i}")(y)
            f = nn.Dense(self.mlp_dim, kernel_init=trunc_normal_init,
                         dtype=self.dtype, name=f"ff_{i}_0")(f.astype(self.dtype))
            f = nn.gelu(f)
            f = nn.Dropout(self.dropout, deterministic=det,
                           name=f"ff_drop_{i}_0")(f)
            f = nn.Dense(dim, kernel_init=trunc_normal_init, dtype=self.dtype,
                         name=f"ff_{i}_1")(f)
            f = nn.Dropout(self.dropout, deterministic=det,
                           name=f"ff_drop_{i}_1")(f)
            y = y + f

        # head: tokens -> spatial degradation map (encoder_ViT.py:193-197)
        g = nn.LayerNorm(dtype=jnp.float32, name="mlp_head_norm")(y)
        g = nn.Dense(dim // cfg.out_channels * cfg.encoder_dim,
                     kernel_init=trunc_normal_init, dtype=self.dtype,
                     name="mlp_head_dense")(g.astype(self.dtype))
        inter = g.reshape(b, cfg.encoder_dim, hh, ww).transpose(0, 2, 3, 1)
        inter = nn.BatchNorm(use_running_average=det, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name="norm")(inter)
        inter = leaky_relu(inter)

        fea = jnp.mean(inter, axis=(1, 2))
        out = nn.Dense(cfg.encoder_dim, dtype=self.dtype, name="mlp_0")(
            fea.astype(self.dtype))
        out = leaky_relu(out)
        out = nn.Dense(cfg.encoder_dim, dtype=self.dtype, name="mlp_1")(out)
        return (fea.astype(jnp.float32), out.astype(jnp.float32)[None],
                inter.astype(self.dtype))
