"""Evaluation: polygon-IoU box matching + streaming P/R/F metrics."""
