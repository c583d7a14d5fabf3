"""Host data-pipeline throughput benchmark.

The reference hides host-side input cost behind 16 DataLoader worker
processes (`/root/reference/train.py:50-51`). This framework instead uses
one GIL-releasing native runtime (native/fairm_io.cpp) behind a single
background prefetch thread (data/prefetch.py). This tool measures whether
that is enough on the actual host:

1. primitive ops — decode, fused crop+dihedral+to-float, Gaussian noise —
   native runtime vs the pure-Python fallbacks;
2. ``FileTrainLoader.next_batch()`` end-to-end (batches/s, host MP/s);
3. prefetch overlap — wall time per training step with a simulated
   accelerator step of ``--step_ms``, loader called inline vs wrapped in
   ``Prefetcher`` — reported as overlap efficiency (1.0 = host time fully
   hidden).

Pure host benchmark: no jax, runs anywhere. Prints one JSON line last.

Usage:
    python tools/loader_bench.py [--root /tmp/loader_bench_tree]
        [--size 320] [--n_train 16] [--patch 128] [--iters 30]
        [--step_ms 40]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frequency_wised_all_in_one_image_restoration_model_tpu import config
from frequency_wised_all_in_one_image_restoration_model_tpu.data import (
    augment, native)
from frequency_wised_all_in_one_image_restoration_model_tpu.data.datasets import (
    FileTrainLoader)
from frequency_wised_all_in_one_image_restoration_model_tpu.data.prefetch import (
    Prefetcher)

TASKS = ["denoising_15", "deraining"]


def _ensure_tree(root: str, size: int, n_train: int) -> None:
    if os.path.isdir(os.path.join(root, "denoising_train", "GT")):
        return
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(
        [sys.executable, os.path.join(here, "prepare_datasets.py"), "synth",
         "--root", root, "--tasks", *TASKS, "--n_train", str(n_train),
         "--n_test", "2", "--size", str(size)],
        check=True, capture_output=True, text=True)


def _time(fn, iters: int) -> float:
    fn()  # warm (file cache, lazy imports, native lib load)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def bench_primitives(root: str, patch: int, iters: int) -> dict:
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.image_io import (
        load_image_rgb as pil_decode)

    gt_dir = os.path.join(root, "denoising_train", "GT")
    path = os.path.join(gt_dir, sorted(os.listdir(gt_dir))[0])
    img = native.decode_rgb(path)
    h, w = img.shape[:2]
    iy = (h - patch) // 2 if h > patch else 0
    ix = (w - patch) // 2 if w > patch else 0
    p = min(patch, h, w)

    def crop_fallback():
        crop = img[iy:iy + p, ix:ix + p]
        return np.ascontiguousarray(augment.dihedral(crop, 5)).astype(
            np.float32) / 255.0

    def noise_fallback():
        rng = np.random.default_rng(7)
        return np.clip(img.astype(np.float32)
                       + rng.standard_normal(img.shape).astype(np.float32)
                       * 25.0, 0, 255).astype(np.uint8)

    out = {"native_available": native.available(),
           "image_hw": [int(h), int(w)]}
    out["decode_ms"] = {"native": _time(lambda: native.decode_rgb(path),
                                        iters) * 1e3,
                        "pil": _time(lambda: pil_decode(path), iters) * 1e3}
    out["crop_augment_ms"] = {
        "native": _time(lambda: native.crop_augment_f32(img, iy, ix, p, 5),
                        iters) * 1e3,
        "numpy": _time(crop_fallback, iters) * 1e3}
    out["noise_ms"] = {
        "native": _time(lambda: native.gaussian_noise_u8(img, 25.0, 7),
                        iters) * 1e3,
        "numpy": _time(noise_fallback, iters) * 1e3}
    return out


def bench_loader(root: str, patch: int, iters: int) -> dict:
    cfg = config.make_config(de_type=TASKS, patch_size=patch, data_root=root)
    loader = FileTrainLoader(cfg, seed=0)
    dt = _time(loader.next_batch, iters)
    b = len(TASKS)
    # each sample decodes/synthesizes a full pair and cuts 2 paired crops
    mp_per_batch = b * 2 * 2 * patch * patch / 1e6
    return {"batch": b, "batch_ms": dt * 1e3,
            "imgs_per_s": b / dt, "host_mp_per_s": mp_per_batch / dt}


def bench_overlap(root: str, patch: int, iters: int, step_ms: float) -> dict:
    cfg = config.make_config(de_type=TASKS, patch_size=patch, data_root=root)
    step_s = step_ms / 1e3

    def run(use_prefetch: bool) -> float:
        loader = FileTrainLoader(cfg, seed=0)
        src = Prefetcher(loader, depth=2) if use_prefetch else loader
        src.next_batch()          # warm
        time.sleep(0.05)          # let the prefetcher refill
        t0 = time.perf_counter()
        for _ in range(iters):
            src.next_batch()
            time.sleep(step_s)    # simulated accelerator step
        dt = (time.perf_counter() - t0) / iters
        if use_prefetch:
            src.close()
        return dt

    inline = run(False)
    overlapped = run(True)
    host = max(inline - step_s, 1e-9)
    hidden = 1.0 - max(overlapped - step_s, 0.0) / host
    return {"step_ms": step_ms, "inline_ms": inline * 1e3,
            "prefetch_ms": overlapped * 1e3,
            "host_ms": host * 1e3, "overlap_efficiency": min(max(hidden, 0.0), 1.0)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", default="/tmp/loader_bench_tree")
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--n_train", type=int, default=16)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--step_ms", type=float, default=40.0)
    a = ap.parse_args(argv)

    _ensure_tree(a.root, a.size, a.n_train)

    prim = bench_primitives(a.root, a.patch, a.iters)
    print(f"native runtime: {'YES' if prim['native_available'] else 'NO (fallbacks)'}"
          f"  image {prim['image_hw'][0]}x{prim['image_hw'][1]}")
    for k in ("decode_ms", "crop_augment_ms", "noise_ms"):
        fast, slow = prim[k].values()
        print(f"  {k:16s} native {fast:7.3f} ms   fallback {slow:7.3f} ms "
              f"  ({slow / max(fast, 1e-9):.1f}x)")

    ld = bench_loader(a.root, a.patch, a.iters)
    print(f"FileTrainLoader.next_batch (B={ld['batch']}, patch {a.patch}): "
          f"{ld['batch_ms']:.2f} ms/batch = {ld['imgs_per_s']:.1f} imgs/s, "
          f"{ld['host_mp_per_s']:.1f} MP/s host-side")

    ov = bench_overlap(a.root, a.patch, a.iters, a.step_ms)
    print(f"prefetch overlap @ {a.step_ms:.0f} ms simulated step: "
          f"inline {ov['inline_ms']:.2f} ms/step, prefetched "
          f"{ov['prefetch_ms']:.2f} ms/step, host work {ov['host_ms']:.2f} ms "
          f"-> {100 * ov['overlap_efficiency']:.0f}% hidden")

    print(json.dumps({"primitives": prim, "loader": ld, "overlap": ov}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
