"""Minimal ``timm`` stand-in so the reference Uformer modules can be
instantiated for golden-parity weight transplants.

The reference's ``net/encoder_Uformer.py:7`` / ``net/decoder_Uformer.py:7``
import exactly three names from ``timm.models.layers`` — ``DropPath``,
``to_2tuple``, ``trunc_normal_`` — all of which are pure-torch utilities.
``install()`` registers a fake ``timm`` package providing them; it is a
no-op when a real timm is importable.

Only used by parity tooling/tests; the TPU framework itself never imports
torch or timm.
"""

from __future__ import annotations

import sys
import types


def install() -> None:
    try:  # a real timm wins
        import timm  # noqa: F401
        return
    except ImportError:
        pass
    if "timm" in sys.modules:  # already shimmed
        return

    import torch
    from torch import nn

    class DropPath(nn.Module):
        """Per-sample stochastic depth (identity in eval mode)."""

        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = float(drop_prob)

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rnd = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x / keep * rnd.floor_()

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return torch.nn.init.trunc_normal_(tensor, mean=mean, std=std,
                                           a=a, b=b)

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers
