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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
