"""Mesh bootstrap and sharding helpers."""

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_shard_info,
    local_mesh,
)
from .sequence import maybe_shard, shard_chunks

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_shard_info",
    "local_mesh",
    "maybe_shard",
    "shard_chunks",
]
