"""Multi-host training path (SURVEY.md §5.8): a real 2-process CPU cluster
(jax.distributed + Gloo collectives) runs one joint step over a global
(2,2) mesh with per-process batch slices, and its global metrics must match
the single-process run on the same global batch.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    port = _free_port()
    ckpt_dir = str(tmp_path / "ckpt")  # shared fs, as Orbax multihost expects

    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port), ckpt_dir], cwd=root,
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    metrics = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("METRICS")][0]
        kv = dict(tok.split("=") for tok in line.split()[1:])
        metrics.append({k: float(v) for k, v in kv.items()})
    # both processes report the same global metrics
    assert metrics[0] == metrics[1]

    # single-process reference on the SAME global batch, 4-device local mesh
    from frequency_wised_all_in_one_image_restoration_model_tpu.parallel import (
        mesh as mesh_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training import (
        loop as loop_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training import (
        state as state_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training import (
        steps as steps_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.steps import (
        array_batch)
    from tests.test_train_step import tiny_setup

    cfg, bundle, loader, _ = tiny_setup(seed=11)
    batch = loop_lib.concat_batches([loader.next_batch(),
                                     loader.next_batch()])
    state = state_lib.create_train_state(
        cfg, bundle, jax.random.PRNGKey(11), batch)
    mesh = mesh_lib.make_mesh(2, 2, devices=jax.devices()[:4])
    state = mesh_lib.replicate_tree(state, mesh)
    sharded = mesh_lib.shard_batch(array_batch(batch), mesh)
    step = jax.jit(steps_lib.make_train_step(cfg, bundle, joint=True))
    new_state, m = step(state, sharded)

    np.testing.assert_allclose(metrics[0]["loss"], float(m["loss"]),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(metrics[0]["contrast"],
                               float(m["contrast_loss"]),
                               rtol=2e-5, atol=1e-6)
    assert int(metrics[0]["ptr"]) == int(new_state.moco.queue_ptr)
