"""Training harness: losses, schedulers, trainers, checkpointing."""
