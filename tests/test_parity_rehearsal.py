"""Composed-pipeline parity rehearsal (VERDICT r2 missing #1): the SAME
flagship weights through the patched reference test.py (CPU torch) and our
eval runner on one synthetic disk-paired dataset tree must agree to
<= 0.05 dB PSNR — the BASELINE.md north-star check, executed end to end
(tiling, stitch, metrics, logging composed; reference test.py:33-84).

Module-level golden parity (test_golden_parity*.py) cannot catch bugs in
this composition — the reference's own input-stitch bug lived exactly here.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_composed_pipeline_matches_reference(tmp_path):
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree unavailable")
    if ROOT not in sys.path:
        sys.path.insert(0, ROOT)
    from tools.parity_rehearsal import run_rehearsal

    results = run_rehearsal(tile=32, tol=0.05, tmp=str(tmp_path))
    assert results, "no tasks ran"
    for task, (ref, ours, dpsnr, dssim) in results.items():
        assert abs(dpsnr) <= 0.05, (
            f"{task}: PSNR diverged by {dpsnr:+.3f} dB (ref {ref!r}, "
            f"ours {ours!r})")
        assert abs(dssim) <= 0.002, f"{task}: SSIM diverged by {dssim:+.5f}"

    # log-format parity: both sides' results.log lines are byte-identical
    ref_log = tmp_path / "ref_out" / "epoch_1_results.log"
    tpu_log = tmp_path / "tpu_out" / "epoch_1_results.log"
    assert tpu_log.exists()
    if ref_log.exists():  # reference test.py only writes it from __main__
        assert ref_log.read_text() == tpu_log.read_text()
