"""Branch transformer blocks.

TPU-native equivalents of the reference branch modules
(avssl/module/kw_modules/TransformerModels.py):

- ``transformer_encoder``: N x torch-style TransformerEncoderLayer
  (post-norm by default, exact-erf GELU FFN) plus a final LayerNorm —
  the parallel branch body (reference :12-96).
- ``mha_and_norm``: one MHA + residual + LayerNorm — the cascaded branch
  body (reference :99-135).

Everything is a pure function over a param pytree; hidden-state extraction
and attention-map extraction mirror the reference extract_* methods.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .attention import mha_init, multi_head_attention
from .basic import (
    ACTIVATIONS,
    Params,
    dropout,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)


# ---------------------------------------------------------------------------
# torch-style TransformerEncoderLayer
# ---------------------------------------------------------------------------
def encoder_layer_init(
    rng: jax.Array, d_model: int, dim_feedforward: int
) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "self_attn": mha_init(k1, d_model),
        "linear1": linear_init(k2, d_model, dim_feedforward),
        "linear2": linear_init(k3, dim_feedforward, d_model),
        "norm1": layer_norm_init(d_model),
        "norm2": layer_norm_init(d_model),
    }


def encoder_layer_apply(
    params: Params,
    x: jnp.ndarray,
    *,
    nhead: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
    key_valid_lens: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    activation: str = "gelu",
    layer_norm_eps: float = 1e-5,
    norm_first: bool = False,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    # fused Pallas layer path (kernels/fused_layer.py): gelu layers with
    # structured masks and no active dropout — the branch transformers in
    # eval/encode, or training with dropout 0
    if (
        activation == "gelu"
        and not (train and dropout_rate > 0)
        and (key_padding_mask is None or key_valid_lens is not None)
    ):
        from ..kernels.fused_layer import fused_encoder_layer

        fused = fused_encoder_layer(
            x,
            key_valid_lens,
            heads=nhead,
            mode="pre" if norm_first else "post",
            eps=layer_norm_eps,
            attn=params["self_attn"],
            fc1=params["linear1"],
            fc2=params["linear2"],
            ln1=params["norm1"],
            ln2=params["norm2"],
        )
        if fused is not None:
            return fused

    act = ACTIVATIONS[activation]
    if rng is not None:
        r_attn, r1, r2, r3 = jax.random.split(rng, 4)
    else:
        r_attn = r1 = r2 = r3 = None

    def sa(h):
        out, _ = multi_head_attention(
            params["self_attn"],
            h,
            h,
            h,
            num_heads=nhead,
            key_padding_mask=key_padding_mask,
            key_valid_lens=key_valid_lens,
            dropout_rate=dropout_rate,
            rng=r_attn,
            train=train,
        )
        return dropout(r1, out, dropout_rate, train)

    def ff(h):
        h = act(linear(params["linear1"], h))
        h = dropout(r2, h, dropout_rate, train)
        h = linear(params["linear2"], h)
        return dropout(r3, h, dropout_rate, train)

    if norm_first:
        x = x + sa(layer_norm(params["norm1"], x, layer_norm_eps))
        x = x + ff(layer_norm(params["norm2"], x, layer_norm_eps))
    else:
        x = layer_norm(params["norm1"], x + sa(x), layer_norm_eps)
        x = layer_norm(params["norm2"], x + ff(x), layer_norm_eps)
    return x


# ---------------------------------------------------------------------------
# TransformerEncoder (stack + final LayerNorm), reference :12-96
# ---------------------------------------------------------------------------
def transformer_encoder_init(
    rng: jax.Array,
    n_layers: int,
    d_model: int,
    dim_feedforward: int,
) -> Params:
    keys = jax.random.split(rng, n_layers)
    return {
        "layers": [
            encoder_layer_init(k, d_model, dim_feedforward) for k in keys
        ],
        "norm": layer_norm_init(d_model),
    }


def transformer_encoder_apply(
    params: Params,
    src: jnp.ndarray,
    *,
    nhead: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
    key_valid_lens: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    activation: str = "gelu",
    layer_norm_eps: float = 1e-5,
    norm_first: bool = False,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    return_hidden_states: bool = False,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, ...]]]:
    """Forward through the layer stack, final LayerNorm applied at the end.

    ``return_hidden_states`` mirrors reference extract_hidden_states
    (TransformerModels.py:16-45): the returned tuple contains the input and
    each layer's output, WITHOUT the final norm applied.
    """
    x = src
    hiddens: List[jnp.ndarray] = []
    n = len(params["layers"])
    rngs = jax.random.split(rng, n) if rng is not None else [None] * n
    for layer_params, layer_rng in zip(params["layers"], rngs):
        hiddens.append(x)
        x = encoder_layer_apply(
            layer_params,
            x,
            nhead=nhead,
            key_padding_mask=key_padding_mask,
            key_valid_lens=key_valid_lens,
            dropout_rate=dropout_rate,
            activation=activation,
            layer_norm_eps=layer_norm_eps,
            norm_first=norm_first,
            rng=layer_rng,
            train=train,
        )
    hiddens.append(x)
    out = layer_norm(params["norm"], x, 1e-5)
    return out, (tuple(hiddens) if return_hidden_states else None)


# ---------------------------------------------------------------------------
# MultiheadAttentionAndNorm (cascaded branch body), reference :99-135
# ---------------------------------------------------------------------------
def mha_and_norm_init(rng: jax.Array, d_model: int) -> Params:
    return {
        "attn": mha_init(rng, d_model),
        "norm": layer_norm_init(d_model),
    }


def mha_and_norm_apply(
    params: Params,
    src: jnp.ndarray,
    *,
    nhead: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
    key_valid_lens: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    layer_norm_eps: float = 1e-5,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    need_weights: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """LayerNorm(MHA(src) + src); optionally per-head attention weights
    (average_attn_weights=False), as used for attention-map visualization
    (reference TransformerModels.py:130-135)."""
    if (
        not need_weights
        and not (train and dropout_rate > 0)
        and (key_padding_mask is None or key_valid_lens is not None)
    ):
        from ..kernels.fused_layer import fused_mha_and_norm

        fused = fused_mha_and_norm(
            src,
            key_valid_lens,
            heads=nhead,
            eps=layer_norm_eps,
            attn=params["attn"],
            norm=params["norm"],
        )
        if fused is not None:
            return fused, None

    attn_out, weights = multi_head_attention(
        params["attn"],
        src,
        src,
        src,
        num_heads=nhead,
        key_padding_mask=key_padding_mask,
        key_valid_lens=key_valid_lens,
        dropout_rate=dropout_rate,
        rng=rng,
        train=train,
        need_weights=need_weights,
        average_attn_weights=False,
    )
    out = layer_norm(params["norm"], attn_out + src, layer_norm_eps)
    return out, weights


# ---------------------------------------------------------------------------
# Unified branch-transformer dispatcher (mirrors getattr(TransformerModels, t))
# ---------------------------------------------------------------------------
def branch_transformer_init(rng: jax.Array, transformer_type: str, args) -> Params:
    if transformer_type == "TransformerEncoder":
        return transformer_encoder_init(
            rng, args["n_layers"], args["d_model"], args["dim_feedforward"]
        )
    if transformer_type == "MultiheadAttentionAndNorm":
        return mha_and_norm_init(rng, args["d_model"])
    raise NotImplementedError(f"transformer type {transformer_type!r}")


def branch_transformer_apply(
    params: Params,
    transformer_type: str,
    args,
    src: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray],
    rng: Optional[jax.Array] = None,
    train: bool = False,
    key_valid_lens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if transformer_type == "TransformerEncoder":
        out, _ = transformer_encoder_apply(
            params,
            src,
            nhead=args["nhead"],
            key_padding_mask=key_padding_mask,
            key_valid_lens=key_valid_lens,
            dropout_rate=args.get("dropout", 0.0),
            activation=args.get("activation", "gelu"),
            layer_norm_eps=args.get("layer_norm_eps", 1e-5),
            norm_first=args.get("norm_first", False),
            rng=rng,
            train=train,
        )
        return out
    if transformer_type == "MultiheadAttentionAndNorm":
        out, _ = mha_and_norm_apply(
            params,
            src,
            nhead=args["nhead"],
            key_padding_mask=key_padding_mask,
            key_valid_lens=key_valid_lens,
            dropout_rate=args.get("dropout", 0.0),
            layer_norm_eps=args.get("layer_norm_eps", 1e-5),
            rng=rng,
            train=train,
        )
        return out
    raise NotImplementedError(f"transformer type {transformer_type!r}")


def branch_transformer_hidden_states(
    params: Params,
    transformer_type: str,
    args,
    src: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, ...]:
    """All hidden states (input + per-layer outputs), eval mode."""
    if transformer_type == "TransformerEncoder":
        _, hiddens = transformer_encoder_apply(
            params,
            src,
            nhead=args["nhead"],
            key_padding_mask=key_padding_mask,
            activation=args.get("activation", "gelu"),
            layer_norm_eps=args.get("layer_norm_eps", 1e-5),
            norm_first=args.get("norm_first", False),
            return_hidden_states=True,
        )
        return hiddens
    if transformer_type == "MultiheadAttentionAndNorm":
        out, _ = mha_and_norm_apply(
            params,
            src,
            nhead=args["nhead"],
            key_padding_mask=key_padding_mask,
            layer_norm_eps=args.get("layer_norm_eps", 1e-5),
        )
        return (src, out)
    raise NotImplementedError(f"transformer type {transformer_type!r}")
