"""Validation-epoch logic tests: image dedupe, recall, keyword
detokenization hit-rate (reference kwClip.py:271-502 contracts)."""

import numpy as np
import pytest

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


@pytest.mark.slow
class TestSpokenCOCOScale:
    """SpokenCOCO-test-scale dress rehearsal (reference kwClip.py:487-491
    runs the full ~25k x ~5k score matrix on GPU): dedupe + device top-k
    recall must stay EXACT at scale — identical hit counts to a numpy
    replica of the reference's argsort-and-walk semantics
    (retrieval.py:45-121). scripts/eval_scale_rehearsal.py is the
    wall-time/memory version of this on real hardware."""

    def test_25k_by_5k_recall_matches_argsort_reference(self):
        n_audio, n_images, dim = 25000, 5000, 512
        rng = np.random.default_rng(0)
        img = rng.standard_normal((n_images, dim)).astype(np.float32)
        img /= np.linalg.norm(img, axis=1, keepdims=True)
        ids = np.repeat(np.arange(n_images, dtype=np.int32), 5)
        audio = img[ids] + 0.9 * rng.standard_normal(
            (n_audio, dim)
        ).astype(np.float32)
        audio /= np.linalg.norm(audio, axis=1, keepdims=True)
        collected = {
            "id": ids,
            "audio_feat": audio,
            "image_feat": img[ids],
        }
        recall_at = (1, 5, 10)
        recall_ab, recall_ba, _ = retrieval_metrics(collected, recall_at)

        scores = audio @ img.T  # ids are already 0..n_images-1 in order
        order = np.argsort(-scores, axis=1)
        for k in recall_at:
            want = float(
                (order[:, :k] == ids[:, None]).any(axis=1).mean() * 100.0
            )
            assert abs(recall_ab[f"recall@{k}"] - want) < 50.0 / n_audio
        order_t = np.argsort(-scores.T, axis=1)
        gold_audio_ids = ids  # candidate ids per audio row
        for k in recall_at:
            ranked = gold_audio_ids[order_t[:, :k]]
            want = float(
                (ranked == np.arange(n_images)[:, None]).any(axis=1).mean()
                * 100.0
            )
            assert abs(recall_ba[f"recall@{k}"] - want) < 50.0 / n_images
