"""Test harness: force a virtual 8-device CPU backend before JAX imports.

The reference has no test suite at all (SURVEY.md §4); this one follows the
plan there: unit tests per op, shape-contract tests mirroring the reference's
``__main__`` smoke blocks, integration tests (loss decreases, tiled eval), and
multi-chip sharding tests on a virtual CPU mesh standing in for a TPU slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
