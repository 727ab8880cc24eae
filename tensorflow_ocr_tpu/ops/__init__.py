"""Compute ops: geometry, rasterization, label generation, losses, decode."""
