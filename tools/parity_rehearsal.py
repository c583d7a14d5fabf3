"""End-to-end quality-parity rehearsal on a synthetic dataset tree.

Executes the composed-pipeline check that PARITY_RUNBOOK.md §5 defines but
real datasets can't (zero egress): the SAME flagship weights drive

* the patched reference ``test.py`` (CPU torch) — its own TestDataset,
  tile grid, overlap-average stitch, skimage PSNR/SSIM, results.log line
  (reference test.py:17-100, with the test.py:67 input-stitch bug patched
  to stitch ``patched_restored``, per BASELINE.md / PARITY_RUNBOOK.md §2);
* our ``evaluation/runner.test_by_task`` + results-log writer.

Weights flow torch -> flax via utils/torch_weights.py (the golden-parity
transplant machinery), so any PSNR disagreement isolates the *composed*
pipeline — tiling, stitch, metric, log format — rather than module math,
which tests/test_golden_parity*.py already pin.

Tasks are disk-paired (deraining / dehazing): the denoising tasks
synthesize noise from different RNG streams on each side and cannot agree
bit-wise.

Usage:  python tools/parity_rehearsal.py [--tile 32] [--tol 0.05]
Prints a per-task table and exits non-zero if any |dPSNR| > tol.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
TASKS = ("deraining", "dehazing")


def _load_patched_ref_test(tmp):
    """Copy reference test.py with the :67 stitch bug fixed (stitch restored
    tiles, not input tiles) and import it against the reference tree."""
    src = open(os.path.join(REF, "test.py")).read()
    bugline = ("E[..., h_idx:h_idx+patch_size, w_idx:w_idx+patch_size]"
               ".add_(patched_input_img[cnt])")
    fixline = ("E[..., h_idx:h_idx+patch_size, w_idx:w_idx+patch_size]"
               ".add_(patched_restored[cnt])")
    assert bugline in src, "reference test.py changed; update the patch"
    path = os.path.join(tmp, "_ref_test_patched.py")
    with open(path, "w") as f:
        f.write(src.replace(bugline, fixline))
    spec = importlib.util.spec_from_file_location("_ref_test_patched", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_rehearsal(tile: int = 32, tol: float = 0.05, tmp: str | None = None,
                  keep: bool = False):
    """Returns {task: (ref_result, ours_result, dpsnr, dssim)}."""
    import numpy as np

    own_tmp = tmp is None
    tmp = tmp or tempfile.mkdtemp(prefix="parity_rehearsal_")
    try:
        return _run(tile, tol, tmp)
    finally:
        if own_tmp and not keep:
            shutil.rmtree(tmp, ignore_errors=True)


def _run(tile, tol, tmp):
    import numpy as np

    # ---- 1. synthetic paired dataset tree ------------------------------
    from tools import prepare_datasets
    data_root = os.path.join(tmp, "data")
    prepare_datasets.main(["synth", "--root", data_root,
                           "--tasks", *TASKS, "--n_train", "1",
                           "--n_test", "2", "--seed", "7"])

    # ---- 2. reference side (CPU torch, patched test.py) ----------------
    import torch
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils import (
        ref_shims)
    ref_shims.install()  # timm + torchvision + skimage + skvideo stand-ins
    old_argv, old_cwd = sys.argv, os.getcwd()
    old_cuda_t, old_cuda_m = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # flagship flags = option.py defaults + all_DC (PARITY_RUNBOOK.md §2)
    sys.argv = ["test", "--degradation_embedding_method", "all_DC",
                "--de_type", *TASKS, "--test_de_type", *TASKS,
                "--crop_test_imgs_size", str(tile),
                "--num_workers", "0",
                "--output_path", os.path.join(tmp, "ref_out") + "/"]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        import option as option_mod
        opt = option_mod.options  # parsed from the argv above on import
        # `option` may already be cached from an earlier import in this
        # process (the golden-parity tests import the reference with
        # default argv AND mutate model-dim flags in place: embed_dim=8,
        # encoder_embed_dim=28/8, frequency_decompose_type, L, ...).
        # Rebuild the WHOLE namespace from a fresh parse of the rehearsal
        # argv — in place, because every cached `net.*` module holds this
        # same object — then re-run the post-parse derivations
        # (reference option.py:59-115; the Ntasks shorthand is unused and
        # encoder_type is always Uformer here).
        fresh = option_mod.parser.parse_args(sys.argv[1:])
        opt.__dict__.clear()
        opt.__dict__.update(vars(fresh))
        opt.batch_size = len(opt.de_type)
        opt.ckpt_path = opt.output_path + "ckpt/"
        if opt.encoder_dim is None:
            opt.encoder_dim = 256
        if opt.lr is None:
            opt.lr = 2e-4
        from net.encoder_Uformer import UformerEncoder as TorchEncoder
        from net.decoder_Uformer import UformerDecoder as TorchDecoder

        torch.manual_seed(0)
        # AirNet-eval equivalent (model.py:66-70 + moco.py:167-170: eval is
        # encoder_q -> inter -> decoder), built directly so img_size matches
        # the tile size (model.py's AirNet can't forward img_size)
        enc_q = TorchEncoder(opt, img_size=tile).eval()
        dec = TorchDecoder(opt, img_size=tile).eval()

        class EvalNet(torch.nn.Module):
            def forward(self, x_query, x_key):
                _, _, inter = enc_q(x_query)
                return dec(x_query, inter)

        net = EvalNet().eval()
        ref_test = _load_patched_ref_test(tmp)
        os.makedirs(opt.output_path, exist_ok=True)
        os.chdir(tmp)  # TestDataset reads the relative 'data/' tree
        ref_results = {}
        with torch.no_grad():
            for task in TASKS:
                ref_results[task] = ref_test.test_by_task(net, task, epochs=1)
        # the reference writes results.log from __main__ (test.py:96-100);
        # reproduce its exact line format for the byte-level log comparison
        with open(os.path.join(opt.output_path, "epoch_1_results.log"),
                  "w") as f:
            for task in TASKS:
                f.write(task + ": " + " " * (25 - len(task))
                        + ref_results[task] + "\n")
        enc_sd = {k: v.detach().numpy() for k, v in enc_q.state_dict().items()}
        dec_sd = {k: v.detach().numpy() for k, v in dec.state_dict().items()}
    finally:
        os.chdir(old_cwd)
        sys.argv = old_argv
        torch.Tensor.cuda = old_cuda_t
        torch.nn.Module.cuda = old_cuda_m

    # ---- 3. our side: transplant + test_by_task + results log ----------
    from frequency_wised_all_in_one_image_restoration_model_tpu import config
    from frequency_wised_all_in_one_image_restoration_model_tpu.evaluation import (
        runner)
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import (
        build_models)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.logging import (
        write_epoch_results_log)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        uformer_encoder_from_torch, uformer_decoder_from_torch)

    cfg = config.make_config(
        encoder_type="Uformer", decoder_type="Uformer", L=3,
        encoder_msa_type="freq", degradation_embedding_method=["all_DC"],
        de_type=list(TASKS), test_de_type=list(TASKS),
        patch_size=tile, crop_test_imgs_size=tile,
        dtype="float32", eval_dtype="float32",
        data_root=data_root + "/",
        output_path=os.path.join(tmp, "tpu_out") + "/")
    bundle = build_models(cfg, eval_mode=True)
    enc_vars = uformer_encoder_from_torch(enc_sd, L=3, msa_type="freq")
    dec_vars = uformer_decoder_from_torch(dec_sd, num_bands=2)

    os.makedirs(cfg.output_path, exist_ok=True)
    eval_fn = runner.make_eval_fn(bundle)
    rows, ours_results = [], {}
    for task in TASKS:
        r = runner.test_by_task(cfg, bundle, enc_vars, dec_vars, task,
                                epochs=1, eval_fn=eval_fn)
        ours_results[task] = r
        rows.append((task, r))
    write_epoch_results_log(cfg, 1, rows)

    # ---- 4. compare ----------------------------------------------------
    def parse(s):
        p, ss = s.split(": ")[1].split("/")
        return float(p), float(ss)

    out = {}
    print("\ntask          ref PSNR/SSIM     tpu PSNR/SSIM     dPSNR    dSSIM")
    for task in TASKS:
        rp, rs = parse(ref_results[task])
        op_, os_ = parse(ours_results[task])
        out[task] = (ref_results[task], ours_results[task], op_ - rp, os_ - rs)
        print(f"{task:12s}  {ref_results[task].split(': ')[1]:>15s}  "
              f"{ours_results[task].split(': ')[1]:>15s}  "
              f"{op_ - rp:+7.3f}  {os_ - rs:+8.5f}")
    worst = max(abs(v[2]) for v in out.values())
    print(f"\nmax |dPSNR| = {worst:.3f} dB (tol {tol})"
          f" -> {'PASS' if worst <= tol else 'FAIL'}")
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--tile", type=int, default=32)
    p.add_argument("--tol", type=float, default=0.05)
    p.add_argument("--keep", action="store_true",
                   help="keep the temp tree for inspection")
    a = p.parse_args(argv)
    res = run_rehearsal(tile=a.tile, tol=a.tol, keep=a.keep)
    return 0 if max(abs(v[2]) for v in res.values()) <= a.tol else 1


if __name__ == "__main__":
    raise SystemExit(main())
