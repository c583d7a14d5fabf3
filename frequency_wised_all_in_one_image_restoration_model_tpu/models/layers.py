"""Shared small layers: activations, MLP, DropPath, init helpers."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(x: jax.Array, slope: float = 0.1) -> jax.Array:
    """LeakyReLU(0.1) — the reference's activation everywhere
    (e.g. encoder_ResNet.py:10)."""
    return nn.leaky_relu(x, negative_slope=slope)


trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)

# torch nn.Conv2d/nn.Linear default reset: kaiming_uniform(a=sqrt(5)) ==
# uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) -> variance 1/(3*fan_in); the
# bias is uniform over the same bound. Flax's default (lecun_normal,
# variance 1/fan_in, zero bias) draws kernels with 1.73x the std — in
# DGRN's 50-deep DGM/SFT residual accumulation that compounds to a ~30x
# output magnitude at init (measured; the torch-initialized reference
# starts at O(1)), which wrecks toy-scale training parity
# (tools/parity_train.py resnet_dgrn). Matching torch's reset fixes the
# start-of-training dynamics; weight-transplant forward parity is
# init-independent (tests/test_golden_parity.py).
torch_conv_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch's default bias reset: uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Mlp(nn.Module):
    """Linear-GELU-Linear token MLP (reference encoder_Uformer.py:374-393)."""

    hidden: int
    out: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out = self.out or x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype,
                     kernel_init=trunc_normal_init)(x)
        x = nn.gelu(x)
        x = nn.Dense(out, dtype=self.dtype, kernel_init=trunc_normal_init)(x)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm's DropPath, used at
    encoder_Uformer.py:576 with rates linspace(0, 0.1))."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("droppath")
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def to_tokens(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, H*W, C]."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


def to_image(x: jax.Array, h: int, w: int) -> jax.Array:
    """[B, H*W, C] -> [B, H, W, C]."""
    b, n, c = x.shape
    assert n == h * w, (n, h, w)
    return x.reshape(b, h, w, c)
