"""Per-task evaluation runner (``test_by_task`` equivalent, test.py:17-84).

Per task: build the test set, tile each image, one batched eval forward over
the tile grid, overlap-average stitch, on-device PSNR/SSIM into
AverageMeters, optional restored-image dump, and the reference's exact
result string ``"PSNR/SSIM: %.2f/%.4f"``.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.airnet import ModelBundle, eval_forward
from ..ops import metrics
from . import tiling


def make_eval_fn(bundle: ModelBundle) -> Callable:
    """Jitted eval forward over a tile mega-batch (reference test.py:59:
    eval AirNet feeds the tile batch as both query and key)."""

    @jax.jit
    def fn(enc_vars, dec_vars, tiles):
        return eval_forward(bundle, enc_vars, dec_vars, tiles)

    return fn


def restore_image(eval_fn, enc_vars, dec_vars, img: np.ndarray,
                  patch: int) -> jax.Array:
    """Tile -> forward -> stitch one image. Returns ``[H, W, C]`` on device."""
    h, w = img.shape[:2]
    tiles, offsets, n = tiling.extract_tiles(img, patch)
    restored = eval_fn(enc_vars, dec_vars, jnp.asarray(tiles))
    return tiling.stitch_tiles(restored, jnp.asarray(offsets),
                               jnp.asarray(n), h, w)


@functools.partial(jax.jit)
def _psnr_ssim_single(restored, clean):
    return (metrics.psnr(restored[None], clean[None])[0],
            metrics.ssim(restored[None], clean[None])[0])


def test_by_task(cfg: Config, bundle: ModelBundle, enc_vars, dec_vars,
                 task: str, epochs: int,
                 dataset: Optional[Iterable] = None,
                 eval_fn: Optional[Callable] = None,
                 pool_tiles: int = 4, mesh=None) -> str:
    """Evaluate one task; returns the reference's result line
    (test.py:80-84). ``dataset`` yields ``(name, degraded, clean)`` float01
    HWC numpy arrays.

    Throughput notes:
    * the reference runs one tiled mega-batch per image (test.py:51-59);
      here tile batches from up to ``pool_tiles`` images are pooled into one
      forward (tiles are independent), amortizing dispatch;
    * with ``mesh`` set, the pooled tile batch is SHARDED over the mesh's
      batch axes — the SURVEY §2.4 spatial-tiling axis: tiles are
      independent, so eval scales across chips with zero halo exchange
      (pad-to-multiple, forward, drop the pad);
    * the single-chip forward runs in CHUNKS of 8 tiles: measured on v5e
      (tools/ab_flags.py batch sweep), the flagship forward peaks at B=8
      — 2.28 MP/s vs 1.81 at B=64 — because small-batch activations stay
      VMEM-resident across fused ops instead of round-tripping HBM.
      Chunking also normalizes shapes (one compiled program, fewer
      tile-bucket recompiles).
    """
    if dataset is None:
        dataset = build_test_dataset(cfg, task)
    if eval_fn is None:
        eval_fn = make_eval_fn(bundle)
    if mesh is not None:
        from ..parallel import mesh as mesh_lib
        enc_vars = mesh_lib.replicate_tree(enc_vars, mesh)
        dec_vars = mesh_lib.replicate_tree(dec_vars, mesh)
        tile_sharding = mesh_lib.batch_sharding(mesh)

    psnr_meter = metrics.AverageMeter()
    ssim_meter = metrics.AverageMeter()

    save_dir = None
    if cfg.save_imgs:
        save_dir = os.path.join(cfg.output_path, f"epoch_{epochs}_imgs",
                                f"test_{task}")
        os.makedirs(save_dir, exist_ok=True)

    patch = cfg.crop_test_imgs_size
    assert patch % 8 == 0, "patch size should be a multiple of window_size"  # test.py:44

    def flush(group):
        if not group:
            return
        tiles = np.concatenate([np.asarray(t) for _, t, _, _, _ in group])
        n_tiles = tiles.shape[0]
        if mesh is not None:
            pad = (-n_tiles) % mesh.size
            if pad:  # wrap-pad (pad may exceed n_tiles on a big mesh)
                extra = np.take(tiles, np.arange(pad) % n_tiles, axis=0)
                tiles = np.concatenate([tiles, extra], axis=0)
            tiles = jax.device_put(tiles, tile_sharding)
            restored = eval_fn(enc_vars, dec_vars, jnp.asarray(tiles))
        else:
            chunk = 8  # VMEM-residency sweet spot (see docstring)
            pad = (-n_tiles) % chunk
            if pad:
                extra = np.take(tiles, np.arange(pad) % n_tiles, axis=0)
                tiles = np.concatenate([tiles, extra], axis=0)
            parts = [eval_fn(enc_vars, dec_vars, jnp.asarray(
                tiles[o:o + chunk])) for o in range(0, tiles.shape[0], chunk)]
            restored = jnp.concatenate(parts, axis=0)
        restored = restored[:n_tiles]
        off = 0
        for name, t, offs, n, clean in group:
            r = tiling.stitch_tiles(restored[off:off + t.shape[0]],
                                    jnp.asarray(offs), jnp.asarray(n),
                                    clean.shape[0], clean.shape[1])
            off += t.shape[0]
            p, s = _psnr_ssim_single(r, jnp.asarray(clean))
            psnr_meter.update(float(p), 1)
            ssim_meter.update(float(s), 1)
            if save_dir is not None:
                from ..utils.image_io import save_image_float01
                save_image_float01(np.asarray(r),
                                   os.path.join(save_dir, name + ".png"))

    group = []
    group_shape = None
    for name, degraded, clean in dataset:
        tiles, offs, n = tiling.extract_tiles(degraded, patch)
        # pool only identically-shaped tile batches (keeps one compiled
        # program per group size; mixed-size datasets flush per image)
        if group and (len(group) >= pool_tiles or group_shape != tiles.shape):
            flush(group)
            group = []
        group_shape = tiles.shape
        group.append((name, tiles, offs, n, clean))
    flush(group)

    return "PSNR/SSIM: %.2f/%.4f" % (psnr_meter.avg, ssim_meter.avg)


def build_test_dataset(cfg: Config, task: str):
    """Synthetic or file-backed test set for one task."""
    if cfg.synthetic_data:
        from ..data.synthetic import SyntheticTestSet
        return SyntheticTestSet(cfg, task, seed=cfg.seed)
    from ..data.datasets import FileTestDataset
    return FileTestDataset(cfg, task)
