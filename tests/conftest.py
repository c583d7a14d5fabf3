"""Test harness: force a virtual 8-device CPU backend before JAX imports.

The reference has no test suite at all (SURVEY.md §4); this one follows the
plan there: unit tests per op, shape-contract tests mirroring the reference's
``__main__`` smoke blocks, integration tests (loss decreases, tiled eval), and
multi-chip sharding tests on a virtual CPU mesh standing in for a TPU slice.
"""

import os

# Force an 8-virtual-device CPU backend. NOTE: this environment boots with a
# sitecustomize that registers a tunneled TPU backend and force-updates
# jax_platforms, so the env var alone is NOT enough — override the config
# directly after import (backends initialize lazily, so this wins as long as
# no device was touched yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# remat became the production config default in round 4, which makes every
# test that builds a train step through make_config() trace jax.checkpoint
# wrappers around each LeWin block (~25% extra suite wall-time on this
# 1-core host, VERDICT r4 #7) while testing nothing new: remat-vs-plain
# math equality has its own dedicated test (tests/test_training_e2e.py
# test_remat_step_matches_plain, which passes remat explicitly and is
# unaffected by this default flip). Pin the cheaper plain backward for
# every test that does not explicitly opt in. CLI/subprocess paths
# (train.py, _multihost_worker.py) keep the production default.
from frequency_wised_all_in_one_image_restoration_model_tpu import (  # noqa: E402
    config as _config)

_make_config_orig = _config.make_config


def _make_config_no_remat(**overrides):
    overrides.setdefault("remat", False)
    return _make_config_orig(**overrides)


_config.make_config = _make_config_no_remat


@pytest.fixture
def rng():
    return np.random.default_rng(0)
