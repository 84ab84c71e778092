"""Mesh/sharding utilities for multi-chip and multi-host scaling."""

from .mesh import ENV_AXIS, batch_sharding, make_mesh, put_selfplay_state, replicated, shard_batch_pytree

__all__ = [
    "ENV_AXIS",
    "batch_sharding",
    "make_mesh",
    "put_selfplay_state",
    "replicated",
    "shard_batch_pytree",
]
