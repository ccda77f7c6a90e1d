"""Pipelines: the validation runner, accuracy comparison, checkpointing."""
