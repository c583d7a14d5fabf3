"""Attention-map frequency analysis (plot_MSA_frequency.py:20-111).

Runs a model with ``intermediates`` captured (the ``sow('attn_map')`` hooks
in WindowAttention / FrequencyWindowAttention stand in for the reference's
``debug_mode`` plumbing) and reports per-band energy of each attention map.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

from ..ops import frequency


def attention_band_energy(attn: np.ndarray, num_bands: int = 5) -> np.ndarray:
    """[..., N, N] attention map -> normalized per-band |spectrum| energy."""
    import jax.numpy as jnp

    mags = np.asarray(frequency.frequency_decompose(
        jnp.asarray(attn, jnp.float32), num_bands, inverse="visual"))
    energy = mags.reshape(num_bands, -1).sum(-1)
    total = energy.sum()
    return energy / total if total > 0 else energy


def collect_attention_maps(apply_fn: Callable, variables: Dict, *args,
                           **kwargs) -> Dict[str, np.ndarray]:
    """Apply a module with intermediates mutable; return path-keyed
    attention maps."""
    _, captured = apply_fn(variables, *args, mutable=["intermediates"],
                           **kwargs)
    found: Dict[str, np.ndarray] = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, path + (str(i),))
        else:
            if any(p == "attn_map" for p in path):
                found["/".join(path)] = np.asarray(tree)

    walk(dict(captured.get("intermediates", {})), ())
    return found


def model_attention_band_report(apply_fn: Callable, variables: Dict, x,
                                num_bands: int = 5, **kwargs
                                ) -> Dict[str, np.ndarray]:
    """Per-attention-layer band-energy histograms for an input batch."""
    maps = collect_attention_maps(apply_fn, variables, x, **kwargs)
    return {k: attention_band_energy(v, num_bands) for k, v in maps.items()}
