"""Mesh / sharding layer (replaces the reference's torch-DP, SURVEY.md §2.6)."""

from .mesh import (
    batch_sharding,
    make_mesh,
    param_partition_specs,
    param_shardings,
    replicated,
    shard_batch_specs,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "param_partition_specs",
    "param_shardings",
    "replicated",
    "shard_batch_specs",
]
