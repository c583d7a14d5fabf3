"""Trained-model parity at toy scale (PARITY_RUNBOOK.md §5 trained row).

Trains the ACTUAL reference (CPU torch, via tools/parity_train.py's
runpy wrapper) and this framework on the same synthetic disk tree and
requires the eval-PSNR trajectories to agree. Slow (two full CPU
trainings at the reference's hard-coded encoder dims — it crashes at any
encoder_embed_dim other than 28, decoder_Uformer.py:176); skipped when
torch or the reference tree is unavailable.
"""

import os

import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree unavailable")
def test_trained_parity_toy(tmp_path):
    from tools import parity_train

    # smallest configuration that shows learning on both sides: 3 epochs
    # (1 encoder-only), 20 steps/epoch. Different inits/RNG streams on the
    # two sides -> the tolerance is on trajectories, not bits (runbook §5).
    rc = parity_train.main([
        "--epochs", "3", "--epochs_encoder", "1", "--steps", "20",
        "--n_train", "2", "--n_test", "2", "--tol", "2.0",
        "--tmp", str(tmp_path)])
    assert rc == 0
