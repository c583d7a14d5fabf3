"""Data pipeline: degradation dataset indexing, deterministic augmentation,
synthetic data for tests/benches."""
