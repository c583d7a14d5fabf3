"""Contrastive ResNet degradation encoder.

Capability match for reference ``net/encoder_ResNet.py:4-47`` (3-stage
residual CNN + global pool + projection MLP), NHWC/TPU-native. Returns
``(fea [B, dim], out [1, B, dim], inter [B, H, W, dim//4])`` — ``inter`` is
the spatial degradation map the DGRN decoder conditions on.

BatchNorm note: under a sharded data axis these BN layers see the *global*
batch (XLA computes the reduction across the mesh), which is exactly the
sync-BN behavior MoCo's DDP batch-shuffle tried to emulate and the reference
left dead (moco.py:68-113).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import leaky_relu, torch_bias_init, torch_conv_init


class ResBlock(nn.Module):
    """Conv-BN-LReLU-Conv-BN + 1x1-Conv-BN shortcut (encoder_ResNet.py:4-20)."""

    out_feat: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=jnp.float32)
        y = nn.Conv(self.out_feat, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=torch_conv_init,
                    dtype=self.dtype)(x)
        y = norm()(y)
        y = leaky_relu(y)
        y = nn.Conv(self.out_feat, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype)(y)
        y = norm()(y)
        s = nn.Conv(self.out_feat, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, kernel_init=torch_conv_init,
                    dtype=self.dtype)(x)
        s = norm()(s)
        return leaky_relu(y + s)


class ResNetEncoder(nn.Module):
    """3-stage encoder; ``dim`` is the contrastive embedding width
    (encoder_ResNet.py:23-47)."""

    dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = ResBlock(self.dim // 4, 1, dtype=self.dtype, name="E_pre")(x, train)
        y = ResBlock(self.dim // 2, 2, dtype=self.dtype)(inter, train)
        y = ResBlock(self.dim, 2, dtype=self.dtype)(y, train)
        fea = jnp.mean(y, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        # torch nn.Linear default reset (matches the reference's
        # untouched MLP head, encoder_ResNet.py:36-40)
        dense = lambda n: nn.Dense(self.dim, kernel_init=torch_conv_init,
                                   bias_init=torch_bias_init(n),
                                   dtype=self.dtype)
        out = dense(y.shape[-1])(fea)
        out = leaky_relu(out)
        out = dense(self.dim)(out)
        # out stacked with a leading band axis (single band for this encoder;
        # the reference returns a 1-element list, encoder_ResNet.py:47)
        return fea.astype(jnp.float32), out.astype(jnp.float32)[None], inter
