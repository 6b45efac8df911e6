"""LR schedules for optax.

Equivalents of the reference schedulers (avssl/optim/scheduler.py:10-47),
expressed as optax-style ``step -> multiplier`` schedules applied to a base
learning rate. Stepped per optimization step, as in the reference
(kwClip.py:687-692, interval="step").
"""

from __future__ import annotations

import jax.numpy as jnp


def noam_schedule(base_lr: float, warmup: int = 4000):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        factor = jnp.where(
            step < warmup,
            (step + 1) / warmup,
            jnp.sqrt(warmup / (step + 1)),
        )
        return base_lr * factor

    return schedule


def linear_warmup_decay_schedule(
    base_lr: float,
    warmup: int = 4000,
    max_step: int = 1_000_000,
    final_lr: float = 1e-8,
):
    final_rate = final_lr / base_lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decay = 1.0 - (1.0 - final_rate) * (step + 1 - warmup) / (
            max_step - warmup
        )
        factor = jnp.where(step < warmup, (step + 1) / warmup, decay)
        return base_lr * factor

    return schedule


def get_schedule(name: str, base_lr: float, **kwargs):
    if name == "noam":
        return noam_schedule(base_lr, **kwargs)
    if name == "linear_warmup_decay":
        return linear_warmup_decay_schedule(base_lr, **kwargs)
    raise NotImplementedError(f"Unknown lr scheduler {name}")
