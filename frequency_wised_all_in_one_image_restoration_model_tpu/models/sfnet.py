"""SFNet-style frequency-pair fusion gate.

Capability match for reference ``net/utils/SFNet_modulator.py:4-40``
(``SFconv`` — an SKNet-style softmax gate fusing a low/high frequency
feature pair; dead code in the reference, never imported, but part of its
utils surface): global-pooled features -> bottleneck 1x1 conv -> per-branch
1x1 convs -> softmax over branches -> weighted sum -> output 1x1 conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SFconv(nn.Module):
    features: int
    m: int = 2          # number of frequency branches
    ratio: int = 2      # bottleneck reduction
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, low: jax.Array, high: jax.Array) -> jax.Array:
        """low/high: ``[B, H, W, C]`` -> fused ``[B, H, W, C]``."""
        d = max(self.features // self.ratio, 4)
        emerge = low + high
        pooled = jnp.mean(emerge, axis=(1, 2), keepdims=True)  # [B,1,1,C]
        z = nn.Conv(d, (1, 1), dtype=self.dtype, name="fc")(pooled)

        att_low = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                          name="fc_low")(z)
        att_high = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                           name="fc_high")(z)
        att = jax.nn.softmax(jnp.stack([att_low, att_high], axis=0), axis=0)

        fused = low * att[0] + high * att[1]
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out")(fused)
