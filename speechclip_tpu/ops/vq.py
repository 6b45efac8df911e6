"""Straight-through vector quantization over the CLIP subword vocabulary.

TPU-native equivalent of the reference SimpleVectorQuantizer
(avssl/module/speechclip_c_modules/my_vector_quantizer.py:12-165): input is a
(B, K, V) tensor of cosine scores between keywords and the token-embedding
table; special tokens are masked out; the output is a (one-hot at eval /
straight-through at train) distribution over the vocabulary plus codebook
usage diagnostics.

Design notes vs the reference:
- all probability math runs in f32 (the reference calls .float() likewise);
- the special-token mask uses finfo.min instead of literal ``+= -inf`` so the
  logits stay NaN-free in low precision (SURVEY.md §7 hard parts);
- the straight-through estimator is ``hard + soft - stop_gradient(soft)``.

Temperature spec strings are parsed exactly like the reference
(``learnable=x`` / ``fixed=x`` / ``(max,min,decay)`` scheduled triple).
"""

from __future__ import annotations

import ast
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .basic import Params

_MASK_VALUE = float(jnp.finfo(jnp.float32).min)


def parse_temp_spec(temp) -> Tuple[str, tuple]:
    """-> (temp_type, payload). payload: init value or (max, min, decay)."""
    if isinstance(temp, (int, float)):
        return "fixed", (float(temp),)
    assert isinstance(temp, str), temp
    if temp.startswith("learnable="):
        return "learnable", (float(ast.literal_eval(temp[len("learnable="):])),)
    if temp.startswith("fixed="):
        return "fixed", (float(ast.literal_eval(temp[len("fixed="):])),)
    triple = ast.literal_eval(temp)
    assert len(triple) == 3, triple
    return "scheduled", tuple(float(t) for t in triple)


def vq_init(temp) -> Params:
    """Params are empty unless the temperature is learnable."""
    temp_type, payload = parse_temp_spec(temp)
    if temp_type == "learnable":
        return {"curr_temp": jnp.asarray([payload[0]], jnp.float32)}
    return {}


def current_temperature(
    params: Params, temp_spec, num_updates: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    temp_type, payload = parse_temp_spec(temp_spec)
    if temp_type == "learnable":
        return params["curr_temp"][0]
    if temp_type == "fixed":
        return jnp.asarray(payload[0], jnp.float32)
    max_t, min_t, decay = payload
    if num_updates is None:
        return jnp.asarray(max_t, jnp.float32)
    return jnp.maximum(
        max_t * jnp.power(decay, num_updates.astype(jnp.float32)), min_t
    )


def vq_apply(
    params: Params,
    x: jnp.ndarray,  # (B, T, V) logits / cosine scores
    *,
    temp_spec,
    prob_mask: Tuple[int, ...] = (0, 2, 3),
    use_gumbel: bool = False,
    hard: bool = True,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    num_updates: Optional[jnp.ndarray] = None,
    ground_truth_perplexity: Optional[float] = None,
) -> dict:
    """Returns the reference's result dict: subword_prob, targets,
    code_perplexity, prob_perplexity, ent_per_t, diversity_loss, temp."""
    bsz, tsz, num_vars = x.shape
    x = x.astype(jnp.float32)

    # mask special tokens (sot/eot/pad analogues) out of the distribution
    if prob_mask:
        masked = jnp.zeros((num_vars,), bool)
        for i in prob_mask:
            masked = masked.at[i].set(True)
        x = jnp.where(masked[None, None, :], _MASK_VALUE, x)

    result = {"num_vars": num_vars}

    k = jnp.argmax(x, axis=-1)  # (B, T)
    hard_x = jax.nn.one_hot(k, num_vars, dtype=jnp.float32)

    # codebook usage diagnostics (reference :93-121)
    hard_probs = jnp.mean(hard_x.reshape(-1, num_vars), axis=0)
    result["code_perplexity"] = jnp.exp(
        -jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7))
    )
    soft = jax.nn.softmax(x, axis=-1)
    avg_probs = jnp.mean(soft.reshape(-1, num_vars), axis=0)
    result["prob_perplexity"] = jnp.exp(
        -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7))
    )
    ent = -jnp.sum(soft * jnp.log(soft + 1e-9), axis=-1)  # (B, T)
    result["ent_per_t"] = jnp.mean(ent, axis=0)  # (T,)

    temp = current_temperature(params, temp_spec, num_updates)
    result["temp"] = temp

    if train:
        if use_gumbel:
            assert rng is not None, "gumbel VQ needs an rng at train time"
            gumbels = -jnp.log(
                -jnp.log(jax.random.uniform(rng, x.shape, jnp.float32, 1e-20, 1.0))
            )
            y_soft = jax.nn.softmax((x + gumbels) / temp, axis=-1)
            if hard:
                idx = jnp.argmax(y_soft, axis=-1)
                y_hard = jax.nn.one_hot(idx, num_vars, dtype=jnp.float32)
                out = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
            else:
                out = y_soft
        else:
            y_soft = jax.nn.softmax(x / temp, axis=-1)
            if hard:
                out = hard_x + y_soft - jax.lax.stop_gradient(y_soft)
            else:
                out = y_soft
    else:
        out = hard_x

    result["subword_prob"] = out  # (B, T, V)

    if ground_truth_perplexity is not None:
        result["diversity_loss"] = (
            jnp.square(result["prob_perplexity"] - ground_truth_perplexity)
            / (num_vars - ground_truth_perplexity) ** 2
        )
    else:
        result["diversity_loss"] = (
            num_vars - result["prob_perplexity"]
        ) / num_vars

    result["targets"] = jnp.argmax(out, axis=-1)[..., None]  # (B, T, 1)
    return result
