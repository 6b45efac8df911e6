"""SpokenCOCO-scale eval dress rehearsal: 25k audio x 5k images.

The largest eval the reference ever runs is SpokenCOCO test — ~25k
utterances x ~5k images, with the full score matrix on GPU
(avssl/model/kwClip.py:487-491). This drives OUR epoch-end path
(training/evaluation.py: collect -> dedupe-by-id -> device score matrix ->
device top-k recall) at exactly that synthetic scale and reports:

- wall time of the epoch-end (excluding the forward passes, which the
  encode benches already cover),
- peak host RSS and the device score-matrix footprint,
- EXACTNESS: recall@k must equal a numpy replica of the reference's
  argsort-and-walk semantics (retrieval.py:45-121) on the same features.

Synthetic features are planted (each audio feature = its image feature +
noise) so the recalls are non-trivial numbers, not 100/0 degenerates.

Run: python scripts/eval_scale_rehearsal.py [--platform cpu]
        [N_AUDIO [N_IMAGES [DIM]]]        (defaults 25000 5000 512)
"""

import resource
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLATFORM = None
args = []
_argv = iter(sys.argv[1:])
for a in _argv:
    if a.startswith("--platform="):
        PLATFORM = a.split("=", 1)[1]
    elif a == "--platform":
        PLATFORM = next(_argv, None)
    elif a.startswith("--"):
        raise SystemExit(f"unknown flag {a!r}")
    else:
        args.append(a)
N_AUDIO = int(args[0]) if len(args) > 0 else 25000
N_IMAGES = int(args[1]) if len(args) > 1 else 5000
DIM = int(args[2]) if len(args) > 2 else 512
RECALL_AT = (1, 5, 10)


def numpy_reference_recall(scores, query_gold, cand_ids, recall_at):
    """The reference's semantics verbatim: argsort descending, map ranked
    candidate ids, hit if the gold id appears in the top k
    (avssl/module/retrieval.py:45-121)."""
    order = np.argsort(-scores, axis=1)
    ranked = np.asarray(cand_ids)[order]
    out = {}
    for k in recall_at:
        hits = (ranked[:, :k] == np.asarray(query_gold)[:, None]).any(axis=1)
        out[f"recall@{k}"] = float(hits.mean() * 100.0)
    return out


def main():
    import jax

    if PLATFORM:
        jax.config.update("jax_platforms", PLATFORM)

    from speechclip_tpu.training.evaluation import (
        collect_validation_outputs,
        retrieval_metrics,
    )

    print(
        f"scale: {N_AUDIO} audio x {N_IMAGES} images, dim {DIM}, "
        f"platform {jax.devices()[0].platform}",
        flush=True,
    )
    per_image = N_AUDIO // N_IMAGES
    rng = np.random.default_rng(0)
    img = rng.standard_normal((N_IMAGES, DIM)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    ids = np.repeat(np.arange(N_IMAGES, dtype=np.int32), per_image)[:N_AUDIO]
    audio = img[ids] + 0.9 * rng.standard_normal((N_AUDIO, DIM)).astype(
        np.float32
    )
    audio /= np.linalg.norm(audio, axis=1, keepdims=True)

    # per-batch outputs like validation_step produces (eval_batch 256)
    outputs = []
    for s in range(0, N_AUDIO, 256):
        e = min(s + 256, N_AUDIO)
        outputs.append(
            {"id": ids[s:e], "audio_feat": audio[s:e], "image_feat": img[ids[s:e]]}
        )

    t0 = time.perf_counter()
    collected = collect_validation_outputs(outputs)
    t_collect = time.perf_counter() - t0

    t0 = time.perf_counter()
    recall_ab, recall_ba, recall_mean = retrieval_metrics(collected, RECALL_AT)
    t_metrics = time.perf_counter() - t0
    t0 = time.perf_counter()
    retrieval_metrics(collected, RECALL_AT)  # warm: compile amortized away
    t_warm = time.perf_counter() - t0

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    score_mb = N_AUDIO * N_IMAGES * 4 / 1e6
    print(f"collect (host concat): {t_collect:.2f} s")
    print(
        f"epoch-end metrics (dedupe + device matmul + top-k + fetch): "
        f"{t_metrics:.2f} s cold (incl. one-time XLA compile) / "
        f"{t_warm:.2f} s warm"
    )
    print(f"peak host RSS: {rss_gb:.2f} GB; device score matrix: {score_mb:.0f} MB")
    print(f"A->I {recall_ab}")
    print(f"I->A {recall_ba}")
    print(f"mean {recall_mean}")

    # exactness vs the reference argsort semantics (host replica)
    _, first_idx = np.unique(ids, return_index=True)
    first_idx = np.sort(first_idx)
    img_dedup = collected["image_feat"][first_idx]
    img_ids = ids[first_idx]
    scores = audio @ img_dedup.T
    want_ab = numpy_reference_recall(scores, ids, img_ids, RECALL_AT)
    want_ba = numpy_reference_recall(scores.T, img_ids, ids, RECALL_AT)
    # equality at HIT-COUNT granularity (the device mean is f32; one hit
    # at this scale moves recall by 100/N >= 4e-3 pts, far above f32 noise)
    for k in want_ab:
        assert abs(recall_ab[k] - want_ab[k]) < 50.0 / N_AUDIO, (
            k, recall_ab[k], want_ab[k],
        )
        assert abs(recall_ba[k] - want_ba[k]) < 50.0 / N_IMAGES, (
            k, recall_ba[k], want_ba[k],
        )
    print("EXACT: device top-k recall == reference argsort semantics")


if __name__ == "__main__":
    main()
