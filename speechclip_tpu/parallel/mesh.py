"""Device mesh + sharding helpers.

Replaces the reference's distribution story (torch-DP single-process
replicate/scatter/gather, SURVEY.md §2.6) with jax.sharding over a mesh:

- axis "data": batch sharding (data parallelism). The contrastive loss is
  global-batch math, so XLA inserts the all-gathers over this axis and
  negatives span every chip (the reference needed training_step_end on the
  DP master for this).
- axis "model": optional tensor parallelism for the big frozen towers
  (ViT-L/14, HuBERT-large): FFN and attention projection weights are sharded
  over this axis; XLA partitions the matmuls and rides ICI for the
  collectives. The reference has no TP at all.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model <= len(devices), (data, model, len(devices))
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_specs(batch: dict) -> dict:
    return {k: P("data") for k in batch}


_TP_SHARDED_SUFFIXES = (
    # (path suffix match, spec): shard the wide FFN dim / fused QKV out dim
    ("fc1", P(None, "model")),
    ("fc2", P("model", None)),
    ("c_fc", P(None, "model")),
    ("c_proj", P("model", None)),
    ("linear1", P(None, "model")),
    ("linear2", P("model", None)),
    ("in_proj", P(None, "model")),
)


def param_partition_specs(params, mesh: Mesh):
    """PartitionSpec pytree for params: replicate everything except the big
    transformer matmuls, which shard over the "model" axis when it exists.

    Megatron-style: fc1/c_fc column-parallel, fc2/c_proj row-parallel, fused
    QKV column-parallel; biases of column-parallel layers shard too.
    """
    model_size = mesh.shape.get("model", 1)

    def spec_for(path, leaf) -> P:
        if model_size <= 1:
            return P()
        names = [
            p.key if hasattr(p, "key") else str(p)
            for p in path
            if hasattr(p, "key") or isinstance(p, str)
        ]
        joined = "/".join(names)
        for suffix, spec in _TP_SHARDED_SUFFIXES:
            if f"/{suffix}/" in f"/{joined}/":
                if names and names[-1] == "w" and leaf.ndim == 2:
                    # only shard if divisible
                    axis = 1 if spec == P(None, "model") else 0
                    if leaf.shape[axis] % model_size == 0:
                        return spec
                if (
                    names
                    and names[-1] == "b"
                    and leaf is not None
                    and spec == P(None, "model")
                    and leaf.ndim == 1
                    and leaf.shape[0] % model_size == 0
                ):
                    return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def param_shardings(params, mesh: Mesh):
    specs = param_partition_specs(params, mesh)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
