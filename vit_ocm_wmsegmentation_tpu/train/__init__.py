"""Training infrastructure: optimizers, schedules, checkpointing, loops."""
