"""Fit and check in the NIQE pristine MVG model from offline-available data.

The reference scores NIQE through skvideo (val_utils.py:69-74), whose
pristine multivariate-Gaussian model ships as a parameter file fit on a
125-image pristine corpus. Neither skvideo nor any real image corpus is
available in this environment, so this tool fits the model on the best
offline corpus that exists:

  * the one real photograph bundled with matplotlib (grace_hopper.jpg),
    taken at three scales so patch statistics cover several frequency
    octaves, and
  * a small set of deterministic synthetic clean images (the same
    generator the hermetic data path uses), so the model is not fit on a
    single photograph's covariance alone.

The fit is deterministic (fixed seed, fixed corpus) and the parameters are
checked in at ``ops/niqe_pristine.npz`` — every process scores against the
same model. Absolute-score parity with skvideo is explicitly descoped
(different pristine corpus ⇒ different Mahalanobis frame; orderings hold —
see PARITY.md and the regression test in tests/test_training_e2e.py).

Usage: python tools/fit_niqe_model.py [--out <path>]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frequency_wised_all_in_one_image_restoration_model_tpu.data.synthetic import (  # noqa: E402
    smooth_image)
from frequency_wised_all_in_one_image_restoration_model_tpu.ops import niqe  # noqa: E402
from frequency_wised_all_in_one_image_restoration_model_tpu.ops.resize import (  # noqa: E402
    imresize)
from frequency_wised_all_in_one_image_restoration_model_tpu.utils.visualization import (  # noqa: E402
    rgb2gray)


def corpus() -> list:
    imgs = []
    try:
        import matplotlib
        from PIL import Image
        path = os.path.join(matplotlib.get_data_path(), "sample_data",
                            "grace_hopper.jpg")
        photo = np.asarray(Image.open(path).convert("RGB"), np.float64)
        gray = rgb2gray(photo)
        for scale in (1.0, 0.75, 0.5):
            imgs.append(gray if scale == 1.0 else imresize(gray, scale=scale))
    except Exception as e:  # pragma: no cover - environment-dependent
        print(f"warning: no real photograph available ({e}); "
              "fitting on synthetic images only", file=sys.stderr)
    rng = np.random.default_rng(0)
    for _ in range(6):
        imgs.append(rgb2gray(smooth_image(rng, 288, 288).astype(np.float64)))
    return imgs


def main():
    ap = argparse.ArgumentParser()
    default_out = os.path.join(
        os.path.dirname(os.path.abspath(niqe.__file__)), "niqe_pristine.npz")
    ap.add_argument("--out", default=default_out)
    args = ap.parse_args()

    imgs = corpus()
    model = niqe.fit_pristine_model(imgs)
    np.savez(args.out, mu=model.mu, cov=model.cov,
             n_images=np.asarray(len(imgs)))
    print(f"fit pristine MVG on {len(imgs)} images -> {args.out}")
    print(f"  mu[:4] = {np.round(model.mu[:4], 4)}")
    print(f"  cov cond = {np.linalg.cond(model.cov):.3g}")

    # sanity: a fresh clean image should score lower (more natural) than
    # the same image with heavy noise
    rng = np.random.default_rng(99)
    clean = smooth_image(rng, 192, 192).astype(np.float64)
    noisy = np.clip(clean + rng.normal(0, 60, clean.shape), 0, 255)
    s_c = niqe.compute_niqe(clean, model)
    s_n = niqe.compute_niqe(noisy, model)
    print(f"  holdout clean={s_c:.3f} noisy={s_n:.3f} "
          f"({'OK' if s_n > s_c else 'INVERTED'})")


if __name__ == "__main__":
    main()
