"""Training layer: optimizer, sharded steps, trainer loop, checkpointing."""

from .optim import build_optimizer
from .train_step import (
    TrainState,
    create_train_state,
    device_prefetch,
    jit_train_step,
    make_eval_step,
    make_train_step,
    place_state,
    shard_batch,
)

__all__ = [
    "build_optimizer",
    "TrainState",
    "create_train_state",
    "device_prefetch",
    "jit_train_step",
    "make_eval_step",
    "make_train_step",
    "place_state",
    "shard_batch",
]
