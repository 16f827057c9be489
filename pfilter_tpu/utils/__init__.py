"""IO, metrics, config, checkpointing and profiling utilities."""
