"""Pure-function op library (JAX/XLA-first; Pallas kernels under ``ops.pallas``)."""

from . import frequency, windows, metrics  # noqa: F401
