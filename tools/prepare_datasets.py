"""Dataset fetch/prep tooling: build the reference's on-disk layout.

The reference trains/tests from ``data/<task>_{train,test}/{Input,GT}/``
directories (dataset_utils.py:18-48,87-95,160-167) with a fixed pairing
rule: the GT file for ``Input/<name>`` is ``GT/<pre>.<ext>`` where ``pre``
is the name's first '.'-split then first '_'-split component
(dataset_utils.py:31-34). Denoising tasks are GT-only (noise synthesized
on the fly, dataset_utils.py:122-126).

This environment has zero network egress, so this tool does not download;
it arranges ALREADY-DOWNLOADED public datasets into the layout, verifies an
existing tree, or synthesizes a tiny random-image tree for smoke tests.

Subcommands
-----------
``layout``   copy/symlink a source dataset into ``<root>/<task>_<split>``:
               prepare_datasets.py layout --root data --task deraining \\
                   --split train --input Rain100L/train/rain \\
                   --gt Rain100L/train/norain --match rain100l
             matchers: ``same-name`` (paired dirs, identical file names),
             ``rain100l`` (``rain-X.png`` <-> ``norain-X.png``),
             ``prefix`` (SOTS-style ``0001_0.8_0.2.jpg`` <-> ``0001.*``),
             ``gt-only`` (denoising: no Input dir).
``verify``   check a tree: every Input resolves to a GT under the
             reference pairing rule, images decode, counts reported.
``synth``    write a small random-image tree covering the given tasks
             (default: the 4tasks suite) so the file pipeline can be
             exercised end-to-end without real data.

Public sources (download on a connected machine):
  BSD400/BSD68  https://github.com/cszn/DnCNN (testsets + train400)
  Urban100      https://github.com/jbhuang0604/SelfExSR
  WED           https://ece.uwaterloo.ca/~k29ma/exploration/
  Rain100L      https://github.com/kuijiang94/Rain100L (JORDER release)
  RESIDE/SOTS   https://sites.google.com/view/reside-dehaze-datasets
  GoPro         https://seungjunnah.github.io/Datasets/gopro
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def _images(d: str):
    return sorted(f for f in os.listdir(d)
                  if f.lower().endswith(IMG_EXTS))


def derive_gt_name(input_file: str) -> str:
    """dataset_utils.py:31-34 (same rule as data/datasets.py)."""
    pre = input_file.split(".")[0].split("_")[0]
    suf = input_file.split(".")[-1]
    return pre + "." + suf


def _match_pairs(input_dir: str, gt_dir: str, match: str):
    """Yield (input_path, gt_path, input_name) under the chosen convention."""
    gt_files = _images(gt_dir)
    gt_by_stem = {}
    for f in gt_files:
        gt_by_stem.setdefault(f.rsplit(".", 1)[0], f)
    for f in _images(input_dir):
        stem = f.rsplit(".", 1)[0]
        if match == "same-name":
            gt = gt_by_stem.get(stem)
        elif match == "rain100l":
            gt = gt_by_stem.get("no" + stem)          # rain-1 -> norain-1
            if gt is None:
                gt = gt_by_stem.get(stem.replace("rain", "norain", 1))
        elif match == "prefix":
            gt = gt_by_stem.get(f.split(".")[0].split("_")[0])
        else:
            raise SystemExit(f"unknown matcher {match!r}")
        if gt is None:
            print(f"  WARNING: no GT match for {f}, skipped")
            continue
        yield os.path.join(input_dir, f), os.path.join(gt_dir, gt), f


def _place(src: str, dst: str, link: bool):
    if os.path.lexists(dst):
        os.remove(dst)
    if link:
        os.symlink(os.path.abspath(src), dst)
    else:
        shutil.copyfile(src, dst)


def cmd_layout(a) -> int:
    task_dir = os.path.join(a.root, f"{a.task}_{a.split}")
    gt_out = os.path.join(task_dir, "GT")
    os.makedirs(gt_out, exist_ok=True)
    n = 0
    if a.match == "gt-only":
        for f in _images(a.gt):
            _place(os.path.join(a.gt, f), os.path.join(gt_out, f), a.link)
            n += 1
    else:
        in_out = os.path.join(task_dir, "Input")
        os.makedirs(in_out, exist_ok=True)
        for src_in, src_gt, name in _match_pairs(a.input, a.gt, a.match):
            # keep the input name; store GT under the name the reference's
            # pairing rule derives from it (pre-underscore stem + input ext)
            _place(src_in, os.path.join(in_out, name), a.link)
            _place(src_gt, os.path.join(gt_out, derive_gt_name(name)), a.link)
            n += 1
    print(f"{task_dir}: {n} {'images' if a.match == 'gt-only' else 'pairs'}")
    return 0 if n else 1


def cmd_verify(a) -> int:
    from frequency_wised_all_in_one_image_restoration_model_tpu.data import (
        datasets)

    bad = 0
    for entry in sorted(os.listdir(a.root)):
        task_dir = os.path.join(a.root, entry)
        gt_dir = os.path.join(task_dir, "GT")
        if not os.path.isdir(gt_dir):
            continue
        in_dir = os.path.join(task_dir, "Input")
        gts = _images(gt_dir)
        if os.path.isdir(in_dir):
            ins = _images(in_dir)
            missing = [f for f in ins
                       if not os.path.exists(
                           os.path.join(gt_dir, derive_gt_name(f)))]
            bad += len(missing)
            for f in missing[:5]:
                print(f"  {entry}: Input/{f} -> missing "
                      f"GT/{derive_gt_name(f)}")
            print(f"{entry}: {len(ins)} inputs, {len(gts)} GT, "
                  f"{len(missing)} unpaired")
            sample = ins and os.path.join(in_dir, ins[0])
        else:
            print(f"{entry}: GT-only, {len(gts)} images")
            sample = gts and os.path.join(gt_dir, gts[0])
        if sample:
            try:
                img = datasets.load_image_rgb(sample)
                assert img.ndim == 3 and img.shape[2] == 3
            except Exception as e:  # noqa: BLE001 - report any decode error
                print(f"  {entry}: decode FAILED for {sample}: {e}")
                bad += 1
    return 1 if bad else 0


def cmd_synth(a) -> int:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(a.seed)

    def write(path, h, w):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(path)

    for task in a.tasks:
        if "denoising" in task and "_" in task:
            # same stripping rule as task_train_dir/task_test_dir:
            # 'denoising_0' -> denoising_*, 'denoising_bsd68_25' ->
            # denoising_bsd68_* (dataset_utils.py:87-95,160-167)
            base = task[:-(len(task.split("_")[-1]) + 1)]
        else:
            base = task
        for split, count in (("train", a.n_train), ("test", a.n_test)):
            task_dir = os.path.join(a.root, f"{base}_{split}")
            gt_out = os.path.join(task_dir, "GT")
            os.makedirs(gt_out, exist_ok=True)
            paired = "denoising" not in task
            if paired:
                in_out = os.path.join(task_dir, "Input")
                os.makedirs(in_out, exist_ok=True)
            for i in range(count):
                if getattr(a, "size", None):
                    h = w = (a.size // 16) * 16
                else:
                    h = 16 * rng.integers(3, 6)
                    w = 16 * rng.integers(3, 6)
                name = f"img{i}_x.png" if paired else f"img{i}.png"
                if paired:
                    write(os.path.join(in_out, name), h, w)
                    write(os.path.join(gt_out, derive_gt_name(name)), h, w)
                else:
                    write(os.path.join(gt_out, name), h, w)
        print(f"{task}: {a.n_train} train / {a.n_test} test")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    lay = sub.add_parser("layout", help="arrange a source dataset")
    lay.add_argument("--root", required=True)
    lay.add_argument("--task", required=True,
                     help="denoising / deraining / dehazing / deblurring")
    lay.add_argument("--split", choices=("train", "test"), required=True)
    lay.add_argument("--input", help="source Input dir (paired tasks)")
    lay.add_argument("--gt", required=True, help="source GT dir")
    lay.add_argument("--match", default="same-name",
                     choices=("same-name", "rain100l", "prefix", "gt-only"))
    lay.add_argument("--link", action="store_true",
                     help="symlink instead of copy")
    lay.set_defaults(fn=cmd_layout)

    ver = sub.add_parser("verify", help="check an existing tree")
    ver.add_argument("--root", required=True)
    ver.set_defaults(fn=cmd_verify)

    syn = sub.add_parser("synth", help="tiny random-image tree")
    syn.add_argument("--root", required=True)
    syn.add_argument("--tasks", nargs="+",
                     default=["denoising_0", "deraining", "dehazing",
                              "deblurring"])
    syn.add_argument("--n_train", type=int, default=8)
    syn.add_argument("--n_test", type=int, default=2)
    syn.add_argument("--seed", type=int, default=0)
    syn.add_argument("--size", type=int, default=None,
                     help="fixed HxW (multiple of 16) instead of random 48-80")
    syn.set_defaults(fn=cmd_synth)

    a = p.parse_args(argv)
    if a.cmd == "layout" and a.match != "gt-only" and not a.input:
        p.error("--input required unless --match gt-only")
    return a.fn(a)


if __name__ == "__main__":
    raise SystemExit(main())
