"""DGRN restoration decoder (the AirNet path).

Capability match for reference ``net/decoder_DGRN.py:9-158``: head conv ->
5 DGG groups x 5 DGB blocks -> tail conv with a global residual. Each DGM
mixes a degradation-conditioned deformable conv (DCN) branch with an SFT
(per-pixel affine from ``inter``) branch plus identity.

Divergence (documented in PARITY.md): the reference's DCN layer is disabled
(``assert False``, deform_conv.py:64), so DGRN cannot run at all as shipped.
Here the DCN branch is a working gather-based modulated deformable conv
(ops/deform_conv.py) whose offset/mask head is zero-initialized exactly like
the reference intended (deform_conv.py:52-54) — at init the branch reduces to
``0.5 * standard_conv``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.deform_conv import modulated_deform_conv2d
from .layers import leaky_relu, torch_bias_init, torch_conv_init


class DCNLayer(nn.Module):
    """Degradation-conditioned modulated deformable conv
    (reference net/utils/deform_conv.py:10-67).

    The offset/mask head convolves ``concat(x, inter)`` (so ``inter`` steers
    where the kernel samples); the sampling weight matches torch's
    ``uniform(-1/sqrt(n), 1/sqrt(n))`` reset (deform_conv.py:43-50).
    """

    channels_out: int
    kernel_size: int = 3
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inter):
        k = self.kernel_size
        pad = (k - 1) // 2
        cin = x.shape[-1]

        feat = jnp.concatenate([x, inter], axis=-1)
        om = nn.Conv(3 * k * k, (k, k), padding=pad,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset_mask")(feat)
        o1, o2, m = jnp.split(om, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(m)

        n = cin * k * k
        stdv = 1.0 / math.sqrt(n)
        weight = self.param(
            "weight", nn.initializers.uniform(scale=2 * stdv),
            (k, k, cin, self.channels_out), jnp.float32)
        weight = weight - stdv  # uniform(0, 2s) - s == uniform(-s, s)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.channels_out,), jnp.float32)
                if self.use_bias else None)
        return modulated_deform_conv2d(
            x, offset, mask, weight.astype(self.dtype), bias,
            stride=1, padding=pad)


class SFTLayer(nn.Module):
    """Per-pixel affine (gamma, beta) predicted from ``inter`` by 1x1 convs
    (reference decoder_DGRN.py:35-57)."""

    channels_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inter):
        def branch(name):
            y = nn.Conv(self.channels_out, (1, 1), use_bias=False,
                        kernel_init=torch_conv_init,
                        dtype=self.dtype, name=name + "_0")(inter)
            y = leaky_relu(y)
            return nn.Conv(self.channels_out, (1, 1), use_bias=False,
                           kernel_init=torch_conv_init,
                           dtype=self.dtype, name=name + "_1")(y)

        gamma = branch("conv_gamma")
        beta = branch("conv_beta")
        return x * gamma + beta


class DGM(nn.Module):
    """Degradation-guided module: DCN(x, inter) + SFT(x, inter) + x
    (reference decoder_DGRN.py:9-32)."""

    n_feat: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inter):
        dcn = DCNLayer(self.n_feat, self.kernel_size, dtype=self.dtype,
                       name="dcn")(x, inter)
        sft = SFTLayer(self.n_feat, dtype=self.dtype, name="sft")(x, inter)
        return x + dcn + sft


class DGB(nn.Module):
    """2x (DGM -> conv) residual block (reference decoder_DGRN.py:60-84)."""

    n_feat: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inter):
        pad = self.kernel_size // 2
        y = leaky_relu(DGM(self.n_feat, self.kernel_size, dtype=self.dtype,
                           name="dgm1")(x, inter))
        y = leaky_relu(nn.Conv(
            self.n_feat, (self.kernel_size,) * 2, padding=pad,
            kernel_init=torch_conv_init,
            bias_init=torch_bias_init(self.n_feat * self.kernel_size ** 2),
            dtype=self.dtype, name="conv1")(y))
        y = leaky_relu(DGM(self.n_feat, self.kernel_size, dtype=self.dtype,
                           name="dgm2")(y, inter))
        y = nn.Conv(self.n_feat, (self.kernel_size,) * 2, padding=pad,
                    kernel_init=torch_conv_init,
                    bias_init=torch_bias_init(
                        self.n_feat * self.kernel_size ** 2),
                    dtype=self.dtype, name="conv2")(y)
        return y + x


class DGG(nn.Module):
    """Group of n_blocks DGBs + conv, residual (reference decoder_DGRN.py:87-110)."""

    n_feat: int
    kernel_size: int = 3
    n_blocks: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inter):
        res = x
        for i in range(self.n_blocks):
            res = DGB(self.n_feat, self.kernel_size, dtype=self.dtype,
                      name=f"dgb{i}")(res, inter)
        res = nn.Conv(self.n_feat, (self.kernel_size,) * 2,
                      padding=self.kernel_size // 2,
                      kernel_init=torch_conv_init,
                      bias_init=torch_bias_init(
                          self.n_feat * self.kernel_size ** 2),
                      dtype=self.dtype, name="conv")(res)
        return res + x


class DGRN(nn.Module):
    """Full restoration net (reference decoder_DGRN.py:113-158).

    ``n_feats = encoder_dim // 4`` for the ResNet encoder and ``encoder_dim``
    for ViT (decoder_DGRN.py:120-124) — pass it explicitly here.
    """

    n_feats: int = 64
    n_groups: int = 5
    n_blocks: int = 5
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inter, train: bool = False):
        del train  # no normalization layers; signature parity with other decoders
        pad = self.kernel_size // 2
        x = x.astype(self.dtype)
        inter = inter.astype(self.dtype)
        head = nn.Conv(self.n_feats, (self.kernel_size,) * 2, padding=pad,
                       kernel_init=torch_conv_init,
                       bias_init=torch_bias_init(3 * self.kernel_size ** 2),
                       dtype=self.dtype, name="head")(x)
        res = head
        for g in range(self.n_groups):
            res = DGG(self.n_feats, self.kernel_size, self.n_blocks,
                      dtype=self.dtype, name=f"dgg{g}")(res, inter)
        res = nn.Conv(self.n_feats, (self.kernel_size,) * 2, padding=pad,
                      kernel_init=torch_conv_init,
                      bias_init=torch_bias_init(
                          self.n_feats * self.kernel_size ** 2),
                      dtype=self.dtype, name="body_conv")(res)
        res = res + head
        out = nn.Conv(3, (self.kernel_size,) * 2, padding=pad,
                      kernel_init=torch_conv_init,
                      bias_init=torch_bias_init(
                          self.n_feats * self.kernel_size ** 2),
                      dtype=self.dtype, name="tail")(res)
        return out.astype(jnp.float32)
