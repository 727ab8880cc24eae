"""Reference-compatible data namespace (`from datasets import icdar`)."""
