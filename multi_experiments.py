"""Experiment sweep driver (capability match for reference
multi_experiments.py:9-53, upgraded for TPU slices).

The reference runs each hyperparameter string sequentially via
``os.system('python train.py ...')``. Here a sweep is a list of experiment
flag-strings dispatched either:

* sequentially in-process (default, single host); or
* sharded round-robin across hosts of a TPU slice
  (``--num_hosts N --host_index i`` — each host takes experiments
  ``i, i+N, i+2N, ...``), the "sweeps shard across a TPU slice" axis from
  BASELINE.json.

Output dirs are derived from the flag string exactly like the reference
(``output/h<slug>/``, multi_experiments.py:9-18), and failures are logged to
``multi_experiments.log`` (:34-38).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def tostr(hyperparams: str) -> str:
    """Flag string -> directory slug (reference multi_experiments.py:9-18)."""
    if not hyperparams:
        return ""
    out = ""
    for sub in hyperparams.split(" "):
        if sub:
            out += "_" + sub.replace("--", "")
    return out


def experiment(hyperparams: str, train: bool, test: bool,
               log_file, python: str = sys.executable) -> bool:
    """Run one experiment as subprocesses (process isolation like the
    reference, so a crash doesn't kill the sweep)."""
    out_dir = "output/h%s/" % tostr(hyperparams)
    ok = True
    try:
        if train:
            print("training: h " + hyperparams)
            subprocess.run(
                [python, "train.py"] + hyperparams.split() +
                ["--output_path", out_dir], check=True)
        if test:
            print("testing: h " + hyperparams)
            subprocess.run(
                [python, "test.py"] + hyperparams.split() +
                ["--output_path", out_dir], check=True)
    except Exception as e:  # noqa: BLE001 — sweep must survive any failure
        log_file.write("[Error] %s\n" % e)
        ok = False
    else:
        log_file.write("[Done]\n")
    if train:
        log_file.write("training: h%s\n" % hyperparams)
    if test:
        log_file.write("testing: h%s\n" % hyperparams)
    log_file.flush()
    return ok


DEFAULT_SWEEP = [
    # the reference's shipped sweep entry (multi_experiments.py:50)
    "--encoder_type ViT --batch_wise_decompose True "
    "--frequency_decompose_type 5_bands --crop_test_imgs_size 128 "
    "--de_type denoising_15 denoising_25 denoising_50 deraining "
    "--test_de_type denoising_bsd68_15 denoising_bsd68_25 "
    "denoising_bsd68_50 deraining",
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep_file", type=str, default=None,
                    help="file with one experiment flag-string per line")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--test", action="store_true")
    ap.add_argument("--num_hosts", type=int, default=1,
                    help="total hosts sharding this sweep")
    ap.add_argument("--host_index", type=int, default=0)
    args = ap.parse_args(argv)

    if args.sweep_file:
        with open(args.sweep_file) as f:
            sweep = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    else:
        sweep = DEFAULT_SWEEP

    os.makedirs("output", exist_ok=True)
    with open("multi_experiments.log", "w") as log_file:
        for i, hp in enumerate(sweep):
            if i % args.num_hosts != args.host_index:
                continue
            experiment(hp, train=args.train, test=args.test or not args.train,
                       log_file=log_file)


if __name__ == "__main__":
    main()
