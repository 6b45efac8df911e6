"""The sharded training / validation step.

Replaces the reference's Lightning DP hot loop (SURVEY.md §3.1, kwClip.py
training_step/training_step_end): one jitted function over a device mesh —
forward, global-batch contrastive loss (XLA all-gathers the batch-sharded
features), backward, clip, Adam, schedule. Params and optimizer state are
replicated over "data" (and optionally tensor-sharded over "model");
the batch is sharded over "data".
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.speechclip import SpeechCLIPModel
from ..parallel.mesh import param_shardings, replicated


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    model_state: Any  # kw-BN running stats etc.
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


def create_train_state(
    model: SpeechCLIPModel, tx: optax.GradientTransformation, rng: jax.Array
) -> TrainState:
    init_rng, train_rng = jax.random.split(rng)
    params, model_state = model.init(init_rng)
    return TrainState(
        params=params,
        model_state=model_state,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=train_rng,
    )


def make_train_step(
    model: SpeechCLIPModel,
    tx: optax.GradientTransformation,
    accumulate_grad_batches: int = 1,
):
    """-> train_step(state, batch) -> (state, metrics). Pure; jit outside.

    ``accumulate_grad_batches``: with optax.MultiSteps the optimizer (and
    its schedule) advance once per k micro-batches, but ``state.step``
    increments per micro-batch — so schedule-consuming model hooks (the
    VQ's scheduled temperature, reference my_vector_quantizer.py:28-51)
    must see ``step // k``, or a scheduled temp would decay k-x too fast.
    """
    accum = max(int(accumulate_grad_batches), 1)

    def train_step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        rng, step_rng = jax.random.split(state.rng)
        num_updates = state.step // accum if accum > 1 else state.step
        trainable = model.trainable_mask(state.params)

        def loss_fn(params):
            # stop_gradient on every frozen leaf: torch's requires_grad=False
            # semantics. Without it the loss still differentiates THROUGH
            # frozen weights that sit between trainable params and the loss
            # (the cascaded branch's frozen CLIP text tower), so (a) XLA
            # computes ~full weight-grad matmuls for those layers and
            # (b) clip_by_global_norm / grad_norm see a norm inflated by
            # grads the reference never computes (PL clips optimizer params
            # only) — a training-dynamics parity bug, not just wasted FLOPs.
            params = jax.tree.map(
                lambda p, t: p if t else jax.lax.stop_gradient(p),
                params,
                trainable,
            )
            loss_feats, log_metrics, _, new_model_state = model.forward(
                params,
                state.model_state,
                batch,
                rng=step_rng,
                train=True,
                num_updates=num_updates,
            )
            losses = model.compute_loss(params, loss_feats)
            return losses["loss"], (losses, log_metrics, new_model_state)

        (loss, (losses, log_metrics, new_model_state)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            **{f"train_{k}": v for k, v in losses.items()},
            **{f"train_{k}": v for k, v in log_metrics.items()},
            "grad_norm": optax.global_norm(grads),
        }
        new_state = TrainState(
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
            step=state.step + 1,
            rng=rng,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model: SpeechCLIPModel):
    """-> eval_step(state, batch) -> features + losses for the retrieval
    epoch logic (reference validation_step :193-230)."""

    # default to a branch the model actually HAS: a cascaded-only model
    # with no retrieval.audio_feat_src key used to inherit "parallel",
    # put None in out["audio_feat"], and crash far away in the trainer's
    # feature collection with a cryptic TypeError
    default_src = "parallel" if model.use_parallel else "cascaded"
    audio_src = model.config.get_path("retrieval.audio_feat_src", default_src)
    have = {"parallel": model.use_parallel, "cascaded": model.use_cascaded}
    if not have.get(audio_src):
        raise ValueError(
            f"retrieval.audio_feat_src={audio_src!r} but the model has no "
            f"{audio_src} branch (objective weights enable: "
            f"{[k for k, v in have.items() if v]})"
        )

    def eval_step(state: TrainState, batch: Dict) -> Dict:
        loss_feats, log_metrics, others, _ = model.forward(
            state.params, state.model_state, batch, train=False
        )
        losses = model.compute_loss(state.params, loss_feats)
        audio_feat = (
            others["cascaded_audio_feat"]
            if audio_src == "cascaded"
            else others["parallel_audio_feat"]
        )
        out = {
            "id": batch["id"],
            "audio_feat": audio_feat,
            "image_feat": others["image_feat"],
            "metrics": {
                **{f"val_{k}": v for k, v in losses.items()},
                **{f"val_{k}": v for k, v in log_metrics.items()},
            },
        }
        if others.get("keywords") is not None:
            out["keywords"] = others["keywords"]
        return out

    return eval_step


def place_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the train state on the mesh: params tensor-sharded over "model"
    where profitable (frozen towers), everything else replicated. Optimizer
    moments exist only for the (small, replicated) trainable params —
    multi_transform's set_to_zero branch keeps none for the towers."""
    return TrainState(
        params=jax.device_put(state.params, param_shardings(state.params, mesh)),
        model_state=jax.device_put(state.model_state, replicated(mesh)),
        opt_state=jax.device_put(state.opt_state, replicated(mesh)),
        step=jax.device_put(state.step, replicated(mesh)),
        rng=jax.device_put(state.rng, replicated(mesh)),
    )


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def staged(items, size: int = 2):
    """Yield ``items`` with a bounded lookahead: the producer runs ``size``
    elements ahead of the consumer. With elements that launch async work on
    creation (jax.device_put), the in-flight work overlaps the consumer's
    compute — classic double buffering at size=2."""
    from collections import deque

    buf = deque()
    for item in items:
        buf.append(item)
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def device_prefetch(batches, mesh: Mesh, size: int = 2):
    """Overlap host->device transfer with compute.

    ``jax.device_put`` is asynchronous; by putting batch k+1 (and k+2, ...)
    on the mesh while step k executes, the H2D copy rides under the compute
    instead of serializing in front of it. ``size`` bounds device-resident
    lookahead batches (2 = classic double buffering). The torch-DataLoader
    equivalent in the reference has no device-side prefetch (scatter happens
    inside DataParallel at step time).
    """
    return staged((shard_batch(b, mesh) for b in batches), size)


def jit_train_step(train_step, donate: bool = True):
    """jit; shardings propagate from the placed state/batch (computation
    follows data)."""
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
