"""Validation-epoch logic tests: image dedupe, recall, keyword
detokenization hit-rate (reference kwClip.py:271-502 contracts)."""

import numpy as np

from speechclip_tpu.training.evaluation import (
    collect_validation_outputs,
    detokenize_keywords,
    retrieval_metrics,
)


class FakeTokenizer:
    """Tiny tokenizer oracle: text is a space-separated list of int ids."""

    def __init__(self, vocab_size=32):
        self.decoder = {i: f"tok{i}" for i in range(vocab_size)}

    def encode(self, text):
        return [int(t) for t in text.split()]


class TestRetrievalEpoch:
    def test_image_dedupe_and_perfect_recall(self):
        rng = np.random.default_rng(0)
        n_img, caps = 5, 3
        img_feats = rng.standard_normal((n_img, 8)).astype(np.float32)
        img_feats /= np.linalg.norm(img_feats, axis=-1, keepdims=True)
        # 3 captions per image; audio feature == its image feature
        ids = np.repeat(np.arange(n_img), caps)
        audio = img_feats[ids]
        outputs = [
            {
                "id": ids[i : i + 5],
                "audio_feat": audio[i : i + 5],
                "image_feat": img_feats[ids[i : i + 5]],
            }
            for i in range(0, n_img * caps, 5)
        ]
        collected = collect_validation_outputs(outputs)
        r_ab, r_ba, r_mean = retrieval_metrics(collected, [1, 5])
        assert r_ab["recall@1"] == 100.0
        assert r_ba["recall@1"] == 100.0
        assert r_mean["recall@5"] == 100.0

    def test_detokenize_hit_rate(self):
        rng = np.random.default_rng(1)
        vocab, dim, n, kw = 32, 8, 4, 2
        emb = rng.standard_normal((vocab, dim)).astype(np.float32)
        # keyword 0 of every sample == embedding of token (5 + i): always hits
        # its gold text; keyword 1 is noise orthogonal-ish
        keywords = rng.standard_normal((n, kw, dim)).astype(np.float32) * 0.01
        gold = []
        for i in range(n):
            keywords[i, 0] = emb[5 + i]
            gold.append(f"{5 + i} 20 21")
        hit_rate, records, kw_top = detokenize_keywords(
            keywords,
            emb,
            gold,
            FakeTokenizer(vocab),
            k_neighbors=1,
            retrieve_method="cosine",
        )
        assert hit_rate[0] == 100.0
        assert len(records) == n
        assert all(len(r["neighbors"]) == kw for r in records)
        assert sorted(kw_top[0]) == [5, 6, 7, 8]

    def test_detokenize_pseudo_inverse(self):
        rng = np.random.default_rng(2)
        emb = rng.standard_normal((16, 8)).astype(np.float32)
        keywords = emb[None, 3:5, :].copy()  # exact embedding rows
        hit_rate, _, _ = detokenize_keywords(
            keywords,
            emb,
            ["3 4"],
            FakeTokenizer(16),
            k_neighbors=1,
            retrieve_method="pseudo_inverse",
        )
        assert hit_rate.tolist() == [100.0, 100.0]
