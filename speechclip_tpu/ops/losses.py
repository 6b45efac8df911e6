"""Contrastive objectives.

``masked_contrastive_loss`` is the TPU-native equivalent of the reference
MaskedContrastiveLoss (avssl/module/losses.py:129-245): symmetric InfoNCE
over an (A, B) feature pair with id-aware negatives — other captions of the
same image are excluded from the negative set.

Scaling design (SURVEY.md §2.6): the reference relied on torch-DP gathering
features onto GPU0 and computing the loss over the full batch there. Here the
loss is written as GLOBAL math over the full (global-batch) logits matrix;
under pjit with batch-sharded features XLA turns the A @ B^T contraction into
all-gathers over the mesh, so negatives span every chip and gradients flow
through the gather — no hand-written collective needed. A ``shard_map``
variant with an explicit ``lax.all_gather`` is provided for use inside
manually-partitioned regions.

Numerics: the reference exponentiates raw logits; this implementation uses a
masked logsumexp (identical value/gradients, no overflow when the trainable
temperature grows).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .basic import Params

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def contrastive_temp_init(
    temperature: float = 0.07, temperature_trainable: bool = False
) -> Params:
    """Trainable temperature parameterized as log(1/t) (reference :160-163)."""
    if temperature_trainable:
        return {"log_inv_temp": jnp.asarray(math.log(1.0 / temperature), jnp.float32)}
    return {}


def contrastive_temperature(
    params: Params, temperature: float, temperature_trainable: bool
) -> jnp.ndarray:
    if temperature_trainable:
        return jnp.exp(params["log_inv_temp"])
    return jnp.asarray(1.0 / temperature, jnp.float32)


def masked_contrastive_loss(
    params: Params,
    feat_a: jnp.ndarray,  # (N, D) L2-normalized
    feat_b: jnp.ndarray,  # (N, D) L2-normalized, row-aligned positives
    ids: Optional[jnp.ndarray] = None,  # (N,) pair ids
    *,
    temperature: float = 0.07,
    temperature_trainable: bool = False,
    margin: float = 0.0,
    dcl: bool = False,
    a2b: bool = True,
    b2a: bool = True,
) -> jnp.ndarray:
    assert a2b or b2a
    n = feat_a.shape[0]
    temp = contrastive_temperature(params, temperature, temperature_trainable)

    logits = (
        jnp.einsum(
            "nd,md->nm",
            feat_a.astype(jnp.float32),
            feat_b.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        * temp
    )

    eye = jnp.eye(n, dtype=bool)
    if margin > 0.0:
        logits = logits - margin * eye.astype(jnp.float32)

    if ids is not None:
        neg_mask = ids[:, None] != ids[None, :]
    else:
        neg_mask = ~eye
    if not dcl:
        neg_mask = neg_mask | eye

    pos = jnp.diagonal(logits)
    masked = jnp.where(neg_mask, logits, _NEG_INF)

    loss = jnp.zeros((), jnp.float32)
    if a2b:
        loss = loss + jnp.mean(jax.nn.logsumexp(masked, axis=1) - pos)
    if b2a:
        loss = loss + jnp.mean(jax.nn.logsumexp(masked, axis=0) - pos)
    if a2b and b2a:
        loss = loss / 2
    return loss


def masked_contrastive_loss_sharded(
    params: Params,
    feat_a: jnp.ndarray,  # (local_N, D)
    feat_b: jnp.ndarray,  # (local_N, D)
    ids: jnp.ndarray,  # (local_N,)
    axis_name: str,
    **kwargs,
) -> jnp.ndarray:
    """Explicit-collective variant for shard_map regions: all-gather features
    and ids over ``axis_name`` (gradient flows through the gather), then the
    full-batch loss. Every shard computes the same scalar."""
    ga = jax.lax.all_gather(feat_a, axis_name, tiled=True)
    gb = jax.lax.all_gather(feat_b, axis_name, tiled=True)
    gids = jax.lax.all_gather(ids, axis_name, tiled=True)
    return masked_contrastive_loss(params, ga, gb, gids, **kwargs)


def supcon_loss(
    features: jnp.ndarray,  # (B, n_views, D) L2-normalized
    temperature: jnp.ndarray | float = 0.07,
    labels: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    contrast_mode: str = "all",
    base_temperature: float = 0.07,
) -> jnp.ndarray:
    """Supervised contrastive loss (Khosla et al. 2020) — alternative
    criterion selectable via ``cl_loss.type: SupConLoss``
    (reference avssl/module/losses.py:8-123)."""
    assert features.ndim == 3
    bsz, n_views, _ = features.shape
    if labels is not None and mask is not None:
        raise ValueError("cannot define both labels and mask")
    if labels is None and mask is None:
        mask = jnp.eye(bsz, dtype=jnp.float32)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    contrast_feature = jnp.concatenate(
        [features[:, i] for i in range(n_views)], axis=0
    )
    if contrast_mode == "one":
        anchor_feature, anchor_count = features[:, 0], 1
    elif contrast_mode == "all":
        anchor_feature, anchor_count = contrast_feature, n_views
    else:
        raise ValueError(contrast_mode)

    logits = (anchor_feature @ contrast_feature.T) / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))

    mask = jnp.tile(mask, (anchor_count, n_views))
    n_anchor = bsz * anchor_count
    self_mask = 1.0 - jnp.eye(n_anchor, mask.shape[1], dtype=jnp.float32)
    mask = mask * self_mask

    exp_logits = jnp.exp(logits) * self_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / jnp.sum(mask, axis=1)
    loss = -(1.0 / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss.reshape(anchor_count, bsz))
