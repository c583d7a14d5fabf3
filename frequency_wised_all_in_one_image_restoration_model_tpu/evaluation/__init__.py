"""Tiled inference + per-task evaluation."""
