"""Training: optimizers, EMA, train state, shard_map step, checkpointing."""
