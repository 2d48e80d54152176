"""Batching, sharding, checkpointing."""
