"""Optimizer assembly.

Mirrors the reference's optimization recipe (avssl/model/kwClip.py:666-694 +
config audio_encoder.optim/scheduler blocks): torch.optim.Adam with L2
weight decay folded into the gradient (NOT AdamW), per-step LR schedule
(noam / linear_warmup_decay), global-norm gradient clipping
(trainer.gradient_clip_val), gradient accumulation
(trainer.accumulate_grad_batches).

Frozen parameters (the towers) take the ``set_to_zero`` branch of
optax.multi_transform, so no Adam moments are materialized for ~95% of the
weights — the TPU-native answer to the reference's requires_grad filtering.
"""

from __future__ import annotations

from typing import Tuple

import jax
import optax

from ..config import ConfigNode
from ..ops.schedules import get_schedule


def build_optimizer(
    config: ConfigNode, trainable_mask
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    opt_cfg = config.audio_encoder.optim
    sched_cfg = dict(config.audio_encoder.scheduler.to_dict())
    name = sched_cfg.pop("name")
    base_lr = float(opt_cfg.args.lr)
    schedule = get_schedule(name, base_lr, **sched_cfg)

    weight_decay = float(opt_cfg.args.get("weight_decay", 0.0))
    betas = opt_cfg.args.get("betas", [0.9, 0.999])
    eps = float(opt_cfg.args.get("eps", 1e-8))

    if opt_cfg.name not in ("Adam", "AdamW"):
        raise NotImplementedError(f"optimizer {opt_cfg.name}")

    chain = []
    clip_val = config.get_path("trainer.gradient_clip_val", 0)
    if clip_val:
        chain.append(optax.clip_by_global_norm(float(clip_val)))
    if opt_cfg.name == "Adam" and weight_decay > 0:
        # torch Adam semantics: L2 term enters the gradient pre-moments
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    if opt_cfg.name == "AdamW" and weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)

    tx = optax.multi_transform(
        {"trainable": tx, "frozen": optax.set_to_zero()},
        param_labels=jax.tree.map(
            lambda t: "trainable" if t else "frozen", trainable_mask
        ),
    )

    accum = int(config.get_path("trainer.accumulate_grad_batches", 1) or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule
