"""Bidirectional retrieval recall@k.

Equivalent of the reference ``mutualRetrieval``
(avssl/module/retrieval.py:6-121), which argsorts the full score matrix on
host and walks ranked ids in Python. Here the ranking runs on device as a
jittable top-k: a candidate row hits at k if any of its top-k columns carries
the gold pair id. Returns the same three dicts (A->B, B->A, mean), x100.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k_max",))
def _topk_ids(scores: jnp.ndarray, cand_ids: jnp.ndarray, k_max: int):
    _, idx = jax.lax.top_k(scores, k_max)  # (N, k_max)
    return cand_ids[idx]


def recall_at_k(
    scores: jnp.ndarray,  # (N_query, N_cand)
    query_gold_ids: jnp.ndarray,  # (N_query,)
    cand_ids: jnp.ndarray,  # (N_cand,)
    recall_at: Sequence[int],
) -> Dict[str, float]:
    k_max = min(max(recall_at), scores.shape[1])
    ranked_ids = _topk_ids(scores, cand_ids, k_max)
    hit = ranked_ids == query_gold_ids[:, None]  # (N, k_max)
    out = {}
    for k in recall_at:
        kk = min(k, k_max)
        out[f"recall@{k}"] = float(
            jnp.mean(jnp.any(hit[:, :kk], axis=1).astype(jnp.float32)) * 100.0
        )
    return out


def mutual_retrieval(
    score_per_a: jnp.ndarray,  # (N_A, N_B)
    score_per_b: jnp.ndarray,  # (N_B, N_A)
    ab_answers: jnp.ndarray,  # (N_A,) gold pair id per A-row
    ba_answers: jnp.ndarray,  # (N_B,) gold pair id per B-row
    recall_at: Sequence[int],
) -> Tuple[Dict[str, float], Dict[str, float], Dict[str, float]]:
    assert score_per_a.shape == (len(ab_answers), len(ba_answers))
    assert score_per_b.shape == (len(ba_answers), len(ab_answers))
    recall_ab = recall_at_k(score_per_a, ab_answers, ba_answers, recall_at)
    recall_ba = recall_at_k(score_per_b, ba_answers, ab_answers, recall_at)
    recall_mean = {
        k: (recall_ab[k] + recall_ba[k]) / 2.0 for k in recall_ab
    }
    return recall_ab, recall_ba, recall_mean
