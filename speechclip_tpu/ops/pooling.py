"""Pooling heads.

Equivalents of the reference pooling module (avssl/module/pooling.py):
``mean_pooling`` (:8-61) and the bilinear attentive pooling family
(:64-390). These are exported module-level APIs in the reference (used by
its tests and legacy models) though not on the active KWClip path.

Static-shape note: the reference slices each row to its length in a Python
loop; here masked means/softmaxes keep everything jittable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .basic import Params, linear, linear_init
from .masking import valid_mask

_NEG_INF = float(jnp.finfo(jnp.float32).min)


# ---------------------------------------------------------------------------
# mean pooling
# ---------------------------------------------------------------------------
def mean_pooling_init(
    rng: jax.Array,
    in_dim: int = 0,
    out_dim: int = 0,
    bias: bool = True,
    pre_proj: bool = True,
    post_proj: bool = True,
) -> Params:
    params: Params = {"pre_proj": None, "post_proj": None}
    if in_dim > 0 and out_dim > 0:
        k1, k2 = jax.random.split(rng)
        if pre_proj:
            params["pre_proj"] = linear_init(k1, in_dim, out_dim, bias)
        if post_proj:
            params["post_proj"] = linear_init(
                k2, in_dim if not pre_proj else out_dim, out_dim, bias
            )
    return params


def mean_pooling_apply(
    params: Params,
    x: jnp.ndarray,  # (B, T, D)
    x_len: Optional[jnp.ndarray] = None,  # (B,)
) -> jnp.ndarray:
    if params.get("pre_proj") is not None:
        x = linear(params["pre_proj"], x)
    if x_len is not None:
        mask = valid_mask(x_len, x.shape[1]).astype(x.dtype)  # (B, T)
        x = jnp.sum(x * mask[..., None], axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1.0
        )
    else:
        x = jnp.mean(x, axis=1)
    if params.get("post_proj") is not None:
        x = linear(params["post_proj"], x)
    return x


# ---------------------------------------------------------------------------
# attentive pooling (learnable bilinear U, tanh align, max+softmax per axis)
# ---------------------------------------------------------------------------
def attentive_pooling_init(
    rng: jax.Array, dim_a: int, dim_b: int, degraded: bool = False
) -> Params:
    if degraded:
        assert dim_a == dim_b
        return {"U": jnp.eye(dim_a, dtype=jnp.float32)}
    return {"U": jax.random.normal(rng, (dim_a, dim_b), jnp.float32)}


def attentive_pooling_mask(
    a_lens: Optional[jnp.ndarray],
    b_lens: Optional[jnp.ndarray],
    max_a: int,
    max_b: int,
) -> jnp.ndarray:
    """Additive (B, max_a, max_b) mask, 0 on / -inf off
    (reference generate_input_msk :90-146)."""
    assert a_lens is not None or b_lens is not None
    bsz = a_lens.shape[0] if a_lens is not None else b_lens.shape[0]
    msk = jnp.zeros((bsz, max_a, max_b), jnp.float32)
    if a_lens is not None:
        pad_a = ~valid_mask(a_lens, max_a)  # (B, max_a)
        msk = jnp.where(pad_a[:, :, None], _NEG_INF, msk)
    if b_lens is not None:
        pad_b = ~valid_mask(b_lens, max_b)
        msk = jnp.where(pad_b[:, None, :], _NEG_INF, msk)
    return msk


def attentive_pooling_apply(
    params: Params,
    input_a: jnp.ndarray,  # (B, dim_A, T_A)
    input_b: jnp.ndarray,  # (B, dim_B, T_B)
    input_msk: Optional[jnp.ndarray] = None,  # (B, T_A, T_B) additive
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Paired pooling (reference forward :314-390) -> ((B, dim_A), (B, dim_B))."""
    align = jnp.einsum("bdt,de,bes->bts", input_a, params["U"], input_b)
    align = jnp.tanh(align)
    if input_msk is not None:
        align = align + input_msk.astype(align.dtype)
    score_a = jax.nn.softmax(jnp.max(align, axis=2), axis=-1)  # (B, T_A)
    score_b = jax.nn.softmax(jnp.max(align, axis=1), axis=-1)  # (B, T_B)
    out_a = jnp.einsum("bdt,bt->bd", input_a, score_a)
    out_b = jnp.einsum("bds,bs->bd", input_b, score_b)
    return out_a, out_b


def attentive_pooling_batch_apply(
    params: Params,
    input_a: jnp.ndarray,  # (B_A, dim, T_A)
    input_b: jnp.ndarray,  # (B_B, dim, T_B)
    input_msk: Optional[jnp.ndarray] = None,  # (B_A, T_A, T_B) additive
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-batch pooling (reference batch_forward :148-240):
    every A against every B -> ((B_A, B_B, dim_A), (B_A, B_B, dim_B))."""
    align = jnp.einsum(
        "adt,de,bes->abts", input_a, params["U"], input_b
    )
    align = jnp.tanh(align)
    if input_msk is not None:
        align = align + input_msk[:, None, :, :].astype(align.dtype)
    score_a = jax.nn.softmax(jnp.max(align, axis=3), axis=-1)  # (B_A,B_B,T_A)
    score_b = jax.nn.softmax(jnp.max(align, axis=2), axis=-1)  # (B_A,B_B,T_B)
    out_a = jnp.einsum("adt,abt->abd", input_a, score_a)
    out_b = jnp.einsum("bds,abs->abd", input_b, score_b)
    return out_a, out_b
