"""Offline analysis toolkit — the library behind the reference's 13
``plot_*.py`` scripts (SURVEY.md §2.2 "Analysis scripts"). Thin CLI wrappers
with the reference filenames live at the repo root."""
