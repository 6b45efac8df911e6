"""SpeechCLIP branch heads.

TPU-native equivalents of the reference branch modules:
- cascaded branch (avssl/model/kwClip.py:697-1001): K learnable keyword CLS
  tokens attend over HuBERT features, project into the CLIP text-embedding
  space, batch-norm, cosine-score against the token-embedding table,
  straight-through vector-quantize, multiply back through the table, and
  feed the resulting K pseudo-subwords through the frozen CLIP text tower.
- parallel branch (avssl/model/kwClip.py:1004-1108): one learnable CLS,
  small transformer, linear projection to the CLIP embedding dim.

Pure functions over param/state pytrees. Static shapes: T (audio frames) and
K (keywords) are bucket constants; lengths become masks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.basic import Params, linear
from ..ops.kw_bn import kw_bn_apply, kw_bn_init
from ..ops.masking import key_padding_mask
from ..ops.mlp import mlp_apply, mlp_init
from ..ops.transformer import (
    branch_transformer_apply,
    branch_transformer_hidden_states,
    branch_transformer_init,
    mha_and_norm_apply,
)
from ..ops.vq import vq_apply, vq_init
from . import clip as clip_mod


def cosine_scores(
    keywords: jnp.ndarray,  # (B, K, D)
    embedding: jnp.ndarray,  # (V, D)
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Per-keyword cosine similarity against the token-embedding table
    (reference kwClip.py:890-900, torch F.cosine_similarity semantics:
    dot / clamp(|a|*|b|, min=eps))."""
    kw = keywords.astype(jnp.float32)
    emb = embedding.astype(jnp.float32)
    dots = jnp.einsum("bkd,vd->bkv", kw, emb, preferred_element_type=jnp.float32)
    kn = jnp.linalg.norm(kw, axis=-1)[:, :, None]  # (B, K, 1)
    en = jnp.linalg.norm(emb, axis=-1)[None, None, :]  # (1, 1, V)
    return dots / jnp.maximum(kn * en, eps)


# ---------------------------------------------------------------------------
# cascaded branch
# ---------------------------------------------------------------------------
def cascaded_branch_init(
    rng: jax.Array,
    branch_cfg,  # config.model_settings.cascaded_branch
    audio_dim: int,
    text_dim: int,
    token_embedding: jnp.ndarray,  # (V, text_dim) for kw-BN init
) -> Tuple[Params, Params]:
    """-> (params, state). state holds kw-BN running stats."""
    k_cls, k_tr, k_proj = jax.random.split(rng, 3)
    kw_num = branch_cfg.keyword.number
    d_model = branch_cfg.transformer_args.d_model

    params: Params = {
        "cls": jax.random.normal(k_cls, (1, kw_num, d_model), jnp.float32),
        "transformer": branch_transformer_init(
            k_tr, branch_cfg.transformer_type, branch_cfg.transformer_args
        ),
    }
    kw_proj = branch_cfg.keyword.get("kw_projection")
    if kw_proj is None:
        params["proj"] = {"linear": None, "mlp": None}
        params["proj"]["linear"] = _linear_init(k_proj, d_model, text_dim)
    else:
        assert kw_proj.dimensions[0] == d_model
        assert kw_proj.dimensions[-1] == text_dim
        params["proj"] = {"linear": None, "mlp": mlp_init(k_proj, kw_proj.dimensions)}

    params["vq"] = vq_init(branch_cfg.vq.args.temp)

    state: Params = {}
    bn_cfg = branch_cfg.keyword.get("batchnorms")
    if bn_cfg is not None:
        emb32 = token_embedding.astype(jnp.float32)
        init_bias = jnp.mean(emb32, axis=0)
        init_scale = jnp.std(emb32, axis=0, ddof=1)
        bn_params, bn_state = kw_bn_init(
            kw_num,
            text_dim,
            bn_cfg.type,
            init_bias,
            init_scale,
            std_scale=bn_cfg.get("std_scale", 1.0),
            parallel=bn_cfg.get("parallel", False),
        )
        params["bn"] = bn_params
        state["bn"] = bn_state
    return params, state


def _linear_init(rng, i, o):
    from ..ops.basic import linear_init

    return linear_init(rng, i, o)


def _project_keywords(
    params: Params, branch_cfg, keywords: jnp.ndarray, rng, train
) -> jnp.ndarray:
    if params["proj"].get("mlp") is not None:
        kw_proj = branch_cfg.keyword.kw_projection
        return mlp_apply(
            params["proj"]["mlp"],
            keywords,
            dropout_rate=kw_proj.get("dropout", 0.1),
            rng=rng,
            train=train,
        )
    return linear(params["proj"]["linear"], keywords)


def _prepend_cls(params, audio_feat, audio_len):
    """The shared preamble of every branch entry point: broadcast the
    learnable cls rows over the batch, prepend them to the audio features,
    and build the key-padding mask. The cls count comes from the stored
    shape — K keywords for the cascaded branch, 1 for parallel — so one
    helper serves all former copies of this block.
    -> (src (B, K+T, D), key_padding_mask (B, K+T))."""
    bsz, t, _ = audio_feat.shape
    kw_num = params["cls"].shape[1]
    cls = jnp.broadcast_to(
        params["cls"].astype(audio_feat.dtype),
        (bsz,) + params["cls"].shape[1:],
    )
    src = jnp.concatenate([cls, audio_feat], axis=1)
    kpm = key_padding_mask(audio_len + kw_num, t + kw_num)
    return src, kpm


def cascaded_branch_apply(
    params: Params,
    state: Params,
    branch_cfg,
    clip_params: Params,
    clip_cfg,
    sot_id: int,
    eot_id: int,
    audio_feat: jnp.ndarray,  # (B, T, D)
    audio_len: jnp.ndarray,  # (B,)
    rng: Optional[jax.Array] = None,
    train: bool = False,
    num_updates: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict, jnp.ndarray, Params]:
    """-> (clip-space audio_feat (B, out), vq_results, keywords (B,K,text_d),
    new_state). Mirrors reference KW_CascadedBranch.forward :857-916."""
    bsz, t, _ = audio_feat.shape
    kw_num = branch_cfg.keyword.number
    if rng is not None:
        r_tr, r_proj, r_vq = jax.random.split(rng, 3)
    else:
        r_tr = r_proj = r_vq = None

    src, kpm = _prepend_cls(params, audio_feat, audio_len)

    out = branch_transformer_apply(
        params["transformer"],
        branch_cfg.transformer_type,
        branch_cfg.transformer_args,
        src,
        kpm,
        rng=r_tr,
        train=train,
        key_valid_lens=audio_len + kw_num,
    )
    keywords = out[:, :kw_num]
    keywords = _project_keywords(params, branch_cfg, keywords, r_proj, train)

    new_state = state
    if "bn" in params:
        bn_cfg = branch_cfg.keyword.batchnorms
        kw_bn_out, bn_state = kw_bn_apply(
            params["bn"],
            state["bn"],
            keywords,
            batchnorm_type=bn_cfg.type,
            parallel=bn_cfg.get("parallel", False),
            train=train,
            replica_groups=bn_cfg.get("replica_groups", 0),
        )
        keywords = kw_bn_out
        new_state = dict(state)
        new_state["bn"] = bn_state

    emb_table = clip_params["text"]["token_embedding"]
    scores = cosine_scores(keywords, emb_table)

    vq_results = vq_apply(
        params["vq"],
        scores,
        temp_spec=branch_cfg.vq.args.temp,
        use_gumbel=branch_cfg.vq.args.get("use_gumbel", False),
        hard=branch_cfg.vq.args.get("hard", True),
        train=train,
        rng=r_vq,
        num_updates=num_updates,
        ground_truth_perplexity=branch_cfg.vq.args.get("groundTruthPerplexity"),
    )

    keywords = jnp.einsum(
        "bkv,vd->bkd",
        vq_results["subword_prob"],
        emb_table.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(audio_feat.dtype)

    feat = clip_mod.encode_keywords(
        clip_params, clip_cfg, keywords, sot_id, eot_id
    )
    return feat, vq_results, keywords, new_state


def cascaded_branch_hidden_states(
    params: Params,
    branch_cfg,
    audio_feat: jnp.ndarray,
    audio_len: jnp.ndarray,
) -> Tuple[jnp.ndarray, ...]:
    """Per-layer hidden states with CLS positions stripped
    (reference extract_hidden_states :828-855)."""
    bsz, t, _ = audio_feat.shape
    kw_num = branch_cfg.keyword.number
    src, kpm = _prepend_cls(params, audio_feat, audio_len)
    hiddens = branch_transformer_hidden_states(
        params["transformer"],
        branch_cfg.transformer_type,
        branch_cfg.transformer_args,
        src,
        kpm,
    )
    return tuple(h[:, kw_num:] for h in hiddens)


def project_keywords_for_visualization(
    params: Params,
    state: Params,
    branch_cfg,
    audio_feat: jnp.ndarray,
    audio_len: jnp.ndarray,
) -> jnp.ndarray:
    """Keywords after transformer+projection+kw-BN, pre-VQ (eval mode) —
    what reference getAttentionMap scores against the embedding table
    (kwClip.py:951-973)."""
    bsz, t, _ = audio_feat.shape
    kw_num = branch_cfg.keyword.number
    src, kpm = _prepend_cls(params, audio_feat, audio_len)
    out = branch_transformer_apply(
        params["transformer"],
        branch_cfg.transformer_type,
        branch_cfg.transformer_args,
        src,
        kpm,
        key_valid_lens=audio_len + kw_num,
    )
    keywords = _project_keywords(params, branch_cfg, out[:, :kw_num], None, False)
    if "bn" in params:
        bn_cfg = branch_cfg.keyword.batchnorms
        keywords, _ = kw_bn_apply(
            params["bn"],
            state["bn"],
            keywords,
            batchnorm_type=bn_cfg.type,
            parallel=bn_cfg.get("parallel", False),
            train=False,
        )
    return keywords


def cascaded_branch_attention_map(
    params: Params,
    branch_cfg,
    audio_feat: jnp.ndarray,
    audio_len: jnp.ndarray,
) -> jnp.ndarray:
    """Per-head attention weights of the CLS rows (B, H, K, T+K)
    (reference getAttentionMap :918-951). Only defined for the
    MultiheadAttentionAndNorm cascaded body (as in all shipped configs)."""
    assert branch_cfg.transformer_type == "MultiheadAttentionAndNorm"
    bsz, t, _ = audio_feat.shape
    kw_num = branch_cfg.keyword.number
    src, kpm = _prepend_cls(params, audio_feat, audio_len)
    _, weights = mha_and_norm_apply(
        params["transformer"],
        src,
        nhead=branch_cfg.transformer_args.nhead,
        key_padding_mask=kpm,
        need_weights=True,
    )
    return weights[:, :, :kw_num, :]


# ---------------------------------------------------------------------------
# parallel branch
# ---------------------------------------------------------------------------
def parallel_branch_init(
    rng: jax.Array, branch_cfg, audio_dim: int, out_dim: int
) -> Params:
    k_cls, k_tr, k_proj = jax.random.split(rng, 3)
    d_model = branch_cfg.transformer_args.d_model
    params: Params = {
        "cls": jax.random.normal(k_cls, (1, 1, d_model), jnp.float32),
        "transformer": branch_transformer_init(
            k_tr, branch_cfg.transformer_type, branch_cfg.transformer_args
        ),
    }
    if branch_cfg.get("need_projection", True):
        params["proj"] = _linear_init(k_proj, audio_dim, out_dim)
    return params


def parallel_branch_apply(
    params: Params,
    branch_cfg,
    audio_feat: jnp.ndarray,
    audio_len: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """-> (B, out_dim). Mirrors reference KW_ParallelBranch.forward :1076-1108."""
    bsz, t, d = audio_feat.shape
    src, kpm = _prepend_cls(params, audio_feat, audio_len)
    out = branch_transformer_apply(
        params["transformer"],
        branch_cfg.transformer_type,
        branch_cfg.transformer_args,
        src,
        kpm,
        rng=rng,
        train=train,
        key_valid_lens=audio_len + 1,
    )
    out = out[:, 0]
    if "proj" in params:
        out = linear(params["proj"], out)
    return out


def parallel_branch_hidden_states(
    params: Params,
    branch_cfg,
    audio_feat: jnp.ndarray,
    audio_len: jnp.ndarray,
) -> Tuple[jnp.ndarray, ...]:
    """(reference extract_hidden_states :1049-1074)"""
    bsz, t, d = audio_feat.shape
    src, kpm = _prepend_cls(params, audio_feat, audio_len)
    hiddens = branch_transformer_hidden_states(
        params["transformer"],
        branch_cfg.transformer_type,
        branch_cfg.transformer_args,
        src,
        kpm,
    )
    return tuple(h[:, 1:] for h in hiddens)
