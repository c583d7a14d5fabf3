"""Low-frequency-sensitivity (LFS) channel analysis, VTC-LFC style.

Capability match for ``utils/lfs_visualization_utils.py`` — which the
reference ships TRUNCATED mid-function (the file ends inside
``get_mask_and_newcfg`` at line 243). Implemented whole here:

* :func:`gaussian_filter_fft` — Gaussian low-pass in the FFT domain
  preserving phase (reference ``filtering``, :62-101);
* :func:`lfs_gradients` — accumulate parameter gradients of the
  distillation objective (restoration L1 on filtered inputs, blended with a
  KL distillation term against the unfiltered teacher's degradation
  embedding; reference ``get_weight_mgrad``, :134-191);
* :func:`taylor_scores` — per-output-channel first-order Taylor importance
  ``sum((w * grad)^2)`` (reference ``taylor_score``, :193-200);
* :func:`channel_mask` — global threshold at a pruning ratio (the part the
  reference truncates).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_filter_fft(images: jax.Array, cutoff: float = 0.065,
                        reverse: bool = False) -> jax.Array:
    """Gaussian low-pass of NHWC images in the FFT amplitude domain.

    ``cutoff`` is the reference's ``L`` (kernel stddev ~ (K*L/2)^2); phase is
    preserved exactly (reference :62-101). ``reverse=False`` applies the
    ifftshifted kernel (low-pass); subtract from the input for the high band.
    """
    x = images.astype(jnp.float32).transpose(0, 3, 1, 2)  # FFT over trailing
    h, w = x.shape[-2:]
    k = min(h, w)
    d0 = (k * cutoff / 2.0) ** 2
    m0 = (k - 1) / 2.0
    ys = jnp.arange(k)[:, None]
    xs = jnp.arange(k)[None, :]
    kernel = jnp.exp(-((ys - m0) ** 2 + (xs - m0) ** 2) / (2.0 * d0))
    if not reverse:
        kernel = jnp.fft.ifftshift(kernel)
    f = jnp.fft.fft2(x)
    amp = jnp.abs(f) * kernel
    pha = jnp.angle(f)
    filtered = jnp.fft.ifft2(amp * jnp.exp(1j * pha)).real
    return filtered.transpose(0, 2, 3, 1)


def lfs_gradients(loss_fn: Callable, params, batches: Iterable,
                  *loss_args) -> Dict:
    """Mean parameter gradient of ``loss_fn(params, batch, *loss_args)``
    over batches (reference get_weight_mgrad accumulation, :180-190)."""
    grad_fn = jax.jit(jax.grad(loss_fn))
    acc = None
    n = 0
    for batch in batches:
        g = grad_fn(params, batch, *loss_args)
        acc = g if acc is None else jax.tree_util.tree_map(jnp.add, acc, g)
        n += 1
    return jax.tree_util.tree_map(lambda t: t / n, acc)


def distillation_loss_fn(restore_fn: Callable, embed_fn: Callable,
                         teacher_embed: jax.Array, alpha: float = 0.1,
                         tau: float = 1.0) -> Callable:
    """Builds the LFS objective: alpha * L1(restored, clean) +
    (1-alpha) * KL(student || teacher) over softened embeddings
    (reference :163-173)."""

    def loss(params, batch):
        restored = restore_fn(params, batch["d1"])
        l1 = jnp.mean(jnp.abs(restored - batch["c1"]))
        student = embed_fn(params, batch["d1"])
        s = jax.nn.log_softmax(student / tau, axis=1)
        t = jax.nn.log_softmax(teacher_embed / tau, axis=1)
        kl = jnp.sum(jnp.exp(t) * (t - s)) * (tau * tau) / student.size
        return l1 * alpha + kl * (1.0 - alpha)

    return loss


def taylor_scores(params, grads) -> Dict[str, np.ndarray]:
    """Per-output-channel importance ``sum((w * g)^2)`` for every kernel
    leaf (reference taylor_score, :193-200)."""
    scores: Dict[str, np.ndarray] = {}

    def walk(p, g, path):
        if isinstance(p, dict):
            for k in p:
                walk(p[k], g[k], path + (k,))
        else:
            if p.ndim >= 2:  # kernels only (skip biases/scales)
                w = np.asarray(p) * np.asarray(g)
                out_axis = -1  # flax kernels are [..., out]
                w = np.moveaxis(w, out_axis, 0).reshape(w.shape[out_axis], -1)
                scores["/".join(path)] = (w ** 2).sum(-1)

    walk(params, grads, ())
    return scores


def channel_mask(scores: Dict[str, np.ndarray], prune_ratio: float = 0.2
                 ) -> Tuple[Dict[str, np.ndarray], float]:
    """Global-threshold channel mask: prune the lowest ``prune_ratio`` of
    all channels by Taylor score (completes the reference's truncated
    get_mask_and_newcfg). Returns (masks, threshold)."""
    all_scores = np.concatenate([v for v in scores.values()])
    k = int(len(all_scores) * prune_ratio)
    thresh = float(np.sort(all_scores)[k]) if k > 0 else -np.inf
    masks = {name: v > thresh for name, v in scores.items()}
    return masks, thresh
