"""MLP projection stack: Linear(+ReLU+Dropout) per hidden layer, bare Linear
last — equivalent of the reference MLPLayers
(avssl/module/projections.py:6-29)."""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from .basic import Params, dropout, linear, linear_init


def mlp_init(rng: jax.Array, units: Sequence[int]) -> Params:
    keys = jax.random.split(rng, max(len(units) - 1, 1))
    layers: List[Params] = []
    for k, (u0, u1) in zip(keys, zip(units[:-1], units[1:])):
        layers.append(linear_init(k, u0, u1))
    return {"layers": layers}


def mlp_apply(
    params: Params,
    x: jnp.ndarray,
    dropout_rate: float = 0.1,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    n = len(params["layers"])
    rngs = jax.random.split(rng, n) if rng is not None else [None] * n
    for i, (layer, r) in enumerate(zip(params["layers"], rngs)):
        x = linear(layer, x)
        if i < n - 1:  # reference drops trailing ReLU+Dropout
            x = jax.nn.relu(x)
            x = dropout(r, x, dropout_rate, train)
    return x
