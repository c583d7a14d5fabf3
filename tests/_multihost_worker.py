"""Worker for tests/test_multihost.py: one process of a 2-process CPU
cluster running one joint train step over a global (2,2) mesh.

Prints ``METRICS loss=<v> contrast=<v> ptr=<v>`` on success.
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=2"])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    from frequency_wised_all_in_one_image_restoration_model_tpu.parallel import (
        distributed as dist_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.parallel import (
        mesh as mesh_lib)
    dist_lib.initialize(coordinator_address=f"127.0.0.1:{port}",
                        num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 4

    from frequency_wised_all_in_one_image_restoration_model_tpu.training import (
        loop as loop_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training import (
        state as state_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training import (
        steps as steps_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.steps import (
        array_batch)
    from tests.test_train_step import tiny_setup  # same tiny model/config

    cfg, bundle, loader, _ = tiny_setup(seed=11)
    # deterministic GLOBAL batch: both processes draw identically
    batch = loop_lib.concat_batches([loader.next_batch(),
                                     loader.next_batch()])  # B = 4
    state = state_lib.create_train_state(
        cfg, bundle, jax.random.PRNGKey(11), batch)

    mesh = mesh_lib.make_mesh(2, 2)
    state = mesh_lib.replicate_tree(state, mesh)
    sharded = dist_lib.shard_global_batch(array_batch(batch), mesh)

    step = jax.jit(steps_lib.make_train_step(cfg, bundle, joint=True),
                   donate_argnums=(0,))
    new_state, m = step(state, sharded)

    # Checkpoint round-trip across BOTH processes (ADVICE r2: Orbax save
    # runs sync_global_processes barriers when process_count > 1 — saving
    # on process 0 only deadlocks; every process must call save/restore).
    from frequency_wised_all_in_one_image_restoration_model_tpu.training import (
        checkpoint as ckpt_lib)
    ckpt_dir = sys.argv[3]
    host_state = jax.tree_util.tree_map(np.asarray, new_state)
    ckpt_lib.save(ckpt_dir, 1, host_state)
    restored = ckpt_lib.restore(ckpt_dir, 1, host_state)
    leaves_a = jax.tree_util.tree_leaves(host_state)
    leaves_b = jax.tree_util.tree_leaves(restored)
    assert all(np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_a, leaves_b))

    print(f"METRICS loss={float(m['loss']):.6f} "
          f"contrast={float(m['contrast_loss']):.6f} "
          f"ptr={int(new_state.moco.queue_ptr)}", flush=True)


if __name__ == "__main__":
    main()
