"""File-backed dataset tests against a synthetic on-disk dataset tree
(reference directory layout, dataset_utils.py:18-48, 87-95)."""

import os

import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu import config
from frequency_wised_all_in_one_image_restoration_model_tpu.data import datasets
from frequency_wised_all_in_one_image_restoration_model_tpu.data.prefetch import Prefetcher


def _make_tree(root, rng):
    """data/denoising_train/GT/*.png + data/deraining_train/{Input,GT}."""
    from PIL import Image

    gt_dir = os.path.join(root, "denoising_train", "GT")
    os.makedirs(gt_dir)
    for i in range(3):
        img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(gt_dir, f"img{i}.png"))

    rain_in = os.path.join(root, "deraining_train", "Input")
    rain_gt = os.path.join(root, "deraining_train", "GT")
    os.makedirs(rain_in)
    os.makedirs(rain_gt)
    for i in range(2):
        clean = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        rain = np.clip(clean.astype(int) + 40, 0, 255).astype(np.uint8)
        # reference name mapping: input 'preN_rain.png' -> GT 'preN.png'
        Image.fromarray(rain).save(os.path.join(rain_in, f"pre{i}_rain.png"))
        Image.fromarray(clean).save(os.path.join(rain_gt, f"pre{i}.png"))


def test_derive_gt_name():
    assert datasets.derive_gt_name("rain-001_x2.png") == "rain-001.png"
    assert datasets.derive_gt_name("im1.jpg") == "im1.jpg"


def test_file_train_loader(tmp_path, rng):
    _make_tree(str(tmp_path), rng)
    cfg = config.make_config(de_type=["denoising_25", "deraining"],
                             patch_size=32, data_root=str(tmp_path) + "/")
    loader = datasets.FileTrainLoader(cfg, seed=0)
    assert loader.total_pairs() == 5
    b = loader.next_batch()
    assert b["d1"].shape == (2, 32, 32, 3)
    assert b["d1"].dtype == np.float32
    assert 0.0 <= b["d1"].min() and b["d1"].max() <= 1.0
    # denoising sample is noisy vs clean; deraining input brighter than GT
    assert not np.allclose(b["d1"][0], b["c1"][0])
    # deterministic under the same seed
    loader2 = datasets.FileTrainLoader(cfg, seed=0)
    b2 = loader2.next_batch()
    np.testing.assert_array_equal(b["d1"], b2["d1"])


def test_file_test_dataset(tmp_path, rng):
    _make_tree(str(tmp_path), rng)
    cfg = config.make_config(de_type=["deraining"],
                             data_root=str(tmp_path) + "/")
    # test dirs use *_test naming; reuse the train tree via symlink
    os.symlink(os.path.join(str(tmp_path), "deraining_train"),
               os.path.join(str(tmp_path), "deraining_test"))
    ds = datasets.FileTestDataset(cfg, "deraining")
    items = list(ds)
    assert len(items) == 2
    name, deg, clean = items[0]
    assert deg.shape == clean.shape
    assert deg.shape[0] % 16 == 0 and deg.shape[1] % 16 == 0


def test_prefetcher(tmp_path, rng):
    _make_tree(str(tmp_path), rng)
    cfg = config.make_config(de_type=["denoising_25", "deraining"],
                             patch_size=32, data_root=str(tmp_path) + "/")
    loader = Prefetcher(datasets.FileTrainLoader(cfg, seed=0), depth=2)
    batches = [loader.next_batch() for _ in range(4)]
    assert all(b["d1"].shape == (2, 32, 32, 3) for b in batches)
    assert loader.total_pairs() == 5  # attribute passthrough
    loader.close()


def test_prepare_datasets_synth_verify_load(tmp_path):
    """tools/prepare_datasets.py: synth tree -> verify passes -> the file
    loader trains from it (the written PARITY_RUNBOOK.md data path)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import prepare_datasets as prep

    root = str(tmp_path / "data")
    assert prep.main(["synth", "--root", root, "--n_train", "3",
                      "--n_test", "1",
                      "--tasks", "denoising_0", "deraining"]) == 0
    assert prep.main(["verify", "--root", root]) == 0

    cfg = config.make_config(de_type=["denoising_0", "deraining"],
                             patch_size=32, data_root=root + "/")
    loader = datasets.FileTrainLoader(cfg, seed=0)
    b = loader.next_batch()
    assert b["d1"].shape == (2, 32, 32, 3)


def test_prepare_datasets_layout_matchers(tmp_path):
    """layout places pairs so the reference pairing rule resolves them."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import prepare_datasets as prep
    from PIL import Image

    src_in = tmp_path / "rain"
    src_gt = tmp_path / "norain"
    src_in.mkdir(), src_gt.mkdir()
    arr = np.zeros((20, 20, 3), np.uint8)
    for i in range(2):
        Image.fromarray(arr).save(src_in / f"rain-{i}.png")
        Image.fromarray(arr).save(src_gt / f"norain-{i}.png")
    root = str(tmp_path / "data")
    assert prep.main(["layout", "--root", root, "--task", "deraining",
                      "--split", "train", "--input", str(src_in),
                      "--gt", str(src_gt), "--match", "rain100l"]) == 0
    assert prep.main(["verify", "--root", root]) == 0
    gt, inp = datasets.get_data_ids(
        os.path.join(root, "deraining_train"), need_synthesize=False)
    assert len(gt) == 2 and all(os.path.exists(p) for p in gt)
