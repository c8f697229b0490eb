"""Data layer: host input pipeline + on-device augmentation (SURVEY.md L1)."""
