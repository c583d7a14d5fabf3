"""Degradation-embedding analyses: t-SNE scatter and lamb/embed_lamb dumps.

Capability match for plot_TSNE_distribution.py:74-94 (t-SNE of contrastive
embeddings colored by task), plot_lamb_curve.py:41-49 (learnable per-band
attention gains from ViT layers) and plot_embed_lamb_curve.py:59-78
(decoder embed_lamb responses per degradation).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np


def tsne_embed(embeddings: np.ndarray, perplexity: float = 30.0,
               seed: int = 0) -> np.ndarray:
    """[N, D] -> [N, 2] via sklearn t-SNE (plot_TSNE_distribution.py:74-80)."""
    from sklearn.manifold import TSNE

    n = embeddings.shape[0]
    perplexity = min(perplexity, max(2.0, (n - 1) / 3.0))
    return TSNE(n_components=2, perplexity=perplexity, init="pca",
                random_state=seed).fit_transform(np.asarray(embeddings))


def collect_embeddings(encode_fn: Callable, batches: Sequence[Dict],
                       band: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Run batches through the contrastive encoder; returns
    (embeddings [N, dim], task_ids [N])."""
    embs, ids = [], []
    for batch in batches:
        out = np.asarray(encode_fn(batch["d1"]))  # [L, B, dim]
        embs.append(out[band])
        ids.append(np.asarray(batch["de_id"]))
    return np.concatenate(embs), np.concatenate(ids)


def extract_lamb_params(params: Dict, key: str = "lamb") -> Dict[str, np.ndarray]:
    """Walk a param tree collecting every `lamb` leaf (ViT attention gains /
    decoder band gains), path-keyed (plot_lamb_curve.py:41-49)."""
    found: Dict[str, np.ndarray] = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:
            if path and path[-1] == key:
                found["/".join(path)] = np.asarray(tree)

    walk(params, ())
    return found


def embed_lamb_responses(decoder_apply: Callable, dec_vars: Dict,
                         x: np.ndarray, ctx) -> Dict[str, np.ndarray]:
    """Run the decoder with intermediates captured and return every
    embed_lamb response (plot_embed_lamb_curve.py:59-78). Relies on the
    `sow('intermediates', 'embed_lamb_*')` hooks in WindowAttention."""
    out, captured = decoder_apply({**dec_vars}, x, ctx, train=False,
                                  mutable=["intermediates"])
    found: Dict[str, np.ndarray] = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, path + (str(i),))
        else:
            if any("embed_lamb" in p for p in path):
                found["/".join(path)] = np.asarray(tree)

    walk(dict(captured.get("intermediates", {})), ())
    return found
