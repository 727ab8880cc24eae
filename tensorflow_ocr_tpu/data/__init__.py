"""Data pipeline: ICDAR loading, augmentation, prefetch."""
