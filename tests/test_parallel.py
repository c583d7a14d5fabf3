"""Multi-device sharding tests on the virtual 8-CPU mesh.

Stands in for a TPU slice (SURVEY.md §4 plan): the full train step is jitted
over a ('data','task') mesh with the batch sharded and state replicated, and
must produce metrics identical to the single-device run.
"""

import jax
import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu.parallel import mesh as mesh_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.training import steps as steps_lib
from frequency_wised_all_in_one_image_restoration_model_tpu.training.steps import array_batch

from tests.test_train_step import tiny_setup


def test_mesh_shapes():
    m = mesh_lib.make_mesh(4, 2)
    assert m.devices.shape == (4, 2, 1)
    assert m.axis_names == ("data", "task", "model")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tensor_parallel_hooks_match_replicated():
    """TP mesh-axis hook (SURVEY.md §2.4): params sharded column-parallel
    over a 2-wide 'model' axis produce the same step metrics as replicated
    (XLA inserts the collectives the layout implies)."""
    cfg, bundle, loader, st = tiny_setup(seed=7, batch_tile=2)  # B = 4
    batch = mesh_lib.tile_batch(array_batch(loader.next_batch()), 2)

    step = jax.jit(steps_lib.make_train_step(cfg, bundle, joint=False))
    _, m_single = step(st, batch)

    mesh = mesh_lib.make_mesh(2, 2, 2)
    assert mesh.devices.shape == (2, 2, 2)
    st_tp = mesh_lib.replicate_tree(st, mesh)
    # min_dim=8 so the tiny test model's kernels actually shard
    tp_params = mesh_lib.shard_params(st.params, mesh, min_dim=8)
    # at least one kernel must really be partitioned over 'model'
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda p: p.sharding.spec, tp_params))
    assert any("model" in str(s) for s in specs)
    st_tp = st_tp.replace(params=tp_params)
    batch_tp = mesh_lib.shard_batch(batch, mesh)
    _, m_tp = step(st_tp, batch_tp)

    for k in m_single:
        np.testing.assert_allclose(float(m_single[k]), float(m_tp[k]),
                                   rtol=2e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_step_matches_single_device():
    cfg, bundle, loader, st = tiny_setup(seed=3, batch_tile=4)  # B = 8, K = 24
    batch = mesh_lib.tile_batch(array_batch(loader.next_batch()), 4)

    # single-device result (no donation so we can reuse st)
    step = jax.jit(steps_lib.make_train_step(cfg, bundle, joint=False))
    _, m_single = step(st, batch)

    mesh = mesh_lib.make_mesh(8, 1)
    st_sharded = mesh_lib.replicate_tree(st, mesh)
    batch_sharded = mesh_lib.shard_batch(batch, mesh)
    _, m_sharded = step(st_sharded, batch_sharded)

    for k in m_single:
        np.testing.assert_allclose(float(m_single[k]), float(m_sharded[k]),
                                   rtol=2e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_joint_step_runs():
    cfg, bundle, loader, st = tiny_setup(seed=4, batch_tile=4)  # B = 8, K = 24
    batch = mesh_lib.tile_batch(array_batch(loader.next_batch()), 4)
    mesh = mesh_lib.make_mesh(4, 2)
    st = mesh_lib.replicate_tree(st, mesh)
    batch = mesh_lib.shard_batch(batch, mesh)
    step = jax.jit(steps_lib.make_train_step(cfg, bundle, joint=True))
    st2, m = step(st, batch)
    assert np.isfinite(float(m["loss"]))
    # queue advanced by the GLOBAL batch: ptr = 8 (K = 24)
    assert int(st2.moco.queue_ptr) == 8
