"""Validation-epoch logic: retrieval metrics + keyword diagnostics.

Equivalent of the reference's validation_epoch_end
(avssl/model/kwClip.py:271-502): collect per-batch features on host, dedupe
image features by pair id (5 captions share one image), build the full
audio@image^T score matrix ON DEVICE, compute recall@k both directions, and
— for cascaded models — detokenize each keyword to its K nearest subwords
(cosine or pseudo-inverse), measure hit rate against the gold captions, and
dump JSON artifacts under <root>/detokenizeText/.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops.retrieval import mutual_retrieval

logger = logging.getLogger(__name__)


def collect_validation_outputs(outputs: List[Dict]) -> Dict[str, np.ndarray]:
    """Concatenate per-batch eval outputs on host (reference
    validation_step_end moves to CPU, kwClip.py:266-269)."""
    out = {}
    for key in ("id", "audio_feat", "image_feat", "keywords"):
        if key in outputs[0]:
            out[key] = np.concatenate(
                [np.asarray(o[key]) for o in outputs], axis=0
            )
    if "gold_text" in outputs[0]:
        out["gold_text"] = [t for o in outputs for t in o["gold_text"]]
    return out


def retrieval_metrics(
    collected: Dict[str, np.ndarray], recall_at: Sequence[int]
) -> Tuple[Dict, Dict, Dict]:
    """Dedupe images by id -> score matrix -> recall (reference :468-502)."""
    all_ids = collected["id"]
    audio_feats = collected["audio_feat"]
    # first occurrence per id (5 captions -> 1 image)
    _, first_idx = np.unique(all_ids, return_index=True)
    first_idx = np.sort(first_idx)
    img_feats = collected["image_feat"][first_idx]
    img_ids = all_ids[first_idx]
    logger.info(
        "Total #%d images, #%d audio", len(img_feats), len(audio_feats)
    )
    # HIGHEST precision: the TPU's default matmul runs reduced-precision
    # passes, which flips top-k order for near-tie queries (measured at
    # 25k x 5k: 2/25000 top-1 flips vs f32 argsort — scripts/
    # eval_scale_rehearsal.py). The reference computes scores in full f32
    # (kwClip.py:487-491); a metric must match it, and the matmul is a
    # trivial ~64 GFLOP once per epoch.
    import jax

    score_per_audio = jnp.matmul(
        jnp.asarray(audio_feats, jnp.float32),
        jnp.asarray(img_feats, jnp.float32).T,
        precision=jax.lax.Precision.HIGHEST,
    )
    recall_ab, recall_ba, recall_mean = mutual_retrieval(
        score_per_audio,
        score_per_audio.T,
        jnp.asarray(all_ids),
        jnp.asarray(img_ids),
        recall_at,
    )
    return recall_ab, recall_ba, recall_mean


def detokenize_keywords(
    keywords: np.ndarray,  # (N, K, D)
    token_embedding: np.ndarray,  # (V, D) (reduced table if reduced mode)
    gold_texts: List[str],
    tokenizer,
    reduced_vocab=None,
    k_neighbors: int = 10,
    retrieve_method: str = "cosine",
    batch_size: int = 256,
) -> Tuple[np.ndarray, List[Dict], List[List[int]]]:
    """-> (hit_rate per keyword x100, per-sample neighbor records, hit token
    ids per keyword). Mirrors reference kwClip.py:278-466."""
    assert retrieve_method in ("cosine", "pseudo_inverse")
    n, kw_num, dim = keywords.shape
    emb = token_embedding.astype(np.float32)

    if retrieve_method == "pseudo_inverse":
        emb_pinv = np.linalg.pinv(emb.T)  # (V, D)

    def to_original(idx: int) -> int:
        if reduced_vocab is not None:
            return int(reduced_vocab.reduced_to_original[int(idx)])
        return int(idx)

    hit_rate = np.zeros(kw_num)
    kw_top_ret: List[List[int]] = [[] for _ in range(kw_num)]
    records: List[Dict] = []

    emb_norm = emb / np.maximum(
        np.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
    )
    for start in range(0, n, batch_size):
        kw = keywords[start : start + batch_size].astype(np.float32)
        bsz = kw.shape[0]
        flat = kw.reshape(-1, dim)
        if retrieve_method == "pseudo_inverse":
            scores = flat @ emb_pinv.T
        else:
            fn = flat / np.maximum(
                np.linalg.norm(flat, axis=-1, keepdims=True), 1e-8
            )
            scores = fn @ emb_norm.T
        # partition-then-sort (the reference's torch.topk): a full argsort
        # over the vocab axis is O(V log V) per row — minutes of host time
        # per SpokenCOCO validation epoch (200k rows x V up to 49k) where
        # partitioning costs seconds. Order of the k kept entries matches.
        k = min(k_neighbors, scores.shape[-1])
        part = np.argpartition(-scores, k - 1, axis=-1)[:, :k]
        part_val = np.take_along_axis(scores, part, axis=-1)
        order = np.argsort(-part_val, axis=-1)
        top_idx = np.take_along_axis(part, order, axis=-1)
        top_val = np.take_along_axis(part_val, order, axis=-1)
        top_idx = top_idx.reshape(bsz, kw_num, k_neighbors)
        top_val = top_val.reshape(bsz, kw_num, k_neighbors)

        for x in range(bsz):
            gold = gold_texts[start + x]
            gold_toks = set(tokenizer.encode(gold)) if tokenizer else set()
            neighbors = {}
            for ki in range(kw_num):
                orig_ids = {to_original(i) for i in top_idx[x, ki]}
                inter = orig_ids & gold_toks
                if inter:
                    hit_rate[ki] += 1
                    kw_top_ret[ki].append(int(next(iter(inter))))
                neighbors[f"keyword_{ki}"] = [
                    [
                        tokenizer.decoder[to_original(i)] if tokenizer else to_original(i),
                        float(v),
                    ]
                    for i, v in zip(top_idx[x, ki], top_val[x, ki])
                ]
            records.append({"gold": gold, "neighbors": neighbors})

    hit_rate = hit_rate / max(n, 1) * 100.0
    return hit_rate, records, kw_top_ret


def run_keyword_diagnostics(
    model,
    collected: Dict,
    token_embedding: np.ndarray,
    tokenizer,
    output_dir: str,
    epoch: int,
) -> Optional[Dict[str, float]]:
    """Detokenization diagnostics + JSON dumps (reference kwClip.py:278-466)."""
    if "keywords" not in collected or tokenizer is None:
        return None
    os.makedirs(output_dir, exist_ok=True)
    kw_cfg = model.config.model_settings.cascaded_branch.keyword
    gold = collected.get("gold_text")
    if gold is None:
        return None
    hit_rate, records, kw_top_ret = detokenize_keywords(
        collected["keywords"],
        np.asarray(token_embedding),
        gold,
        tokenizer,
        reduced_vocab=model.reduced_vocab,
        k_neighbors=kw_cfg.get("detokenized_K_neighbors", 10),
        retrieve_method=kw_cfg.get("retrieve_method", "cosine"),
    )
    with open(os.path.join(output_dir, f"kw_hit_ep{epoch}.json"), "w") as f:
        json.dump(kw_top_ret, f)
    with open(os.path.join(output_dir, f"keywords_ep{epoch}.json"), "w") as f:
        json.dump(records, f)
    return {f"kw_{i}": float(hit_rate[i]) for i in range(len(hit_rate))}
