"""Subword-usage statistics for the reduced-vocabulary mode.

Capability equivalent of the reference's offline stat scripts
(avssl/data/{flickr,coco}_stat/stat_textCLIP_input.py, SURVEY.md §2.4):
tokenize every caption in the corpus, count subword frequencies, and save
``(token_id, count)`` npy tables sorted by frequency and by id — the files
``clip.reduce_subword_embbedding`` consumes. SOT/EOT are always included
(every tokenized caption contains them, as in the reference).

Usage:
  python -m speechclip_tpu.data.vocab_stats --dataset flickr \
      --dataset_root data/flickr --output_dir assets/flickr_stat
"""

from __future__ import annotations

import argparse
import os
from collections import Counter
from typing import Iterable

import numpy as np


def compute_vocab_usage(texts: Iterable[str], tokenizer) -> np.ndarray:
    """-> (V_used, 2) int64 [token_id, count] sorted by id.

    Counts the FULL padded 77-token buffers — including pad id 0 — exactly
    like the reference stat script, which flattens ``clip.tokenize`` output
    (avssl/data/flickr_stat/stat_textCLIP_input.py:31-37). The shipped
    byfreq tables therefore carry a pad row, and the reduced-vocab row
    semantics depend on it: byfreq rows 0/2/3 are pad/SOT/EOT, which is
    what the VQ's default ``prob_msk=(0, 2, 3)`` masks
    (my_vector_quantizer.py:78-79). Dropping id 0 would shift every reduced
    id by one relative to a checkpoint trained on the shipped tables and
    silently break the original<->reduced id mapping.
    """
    counter: Counter = Counter()
    for text in texts:
        # truncate=False: the reference stat script calls clip.tokenize with
        # its default truncate=False and RAISES on >75-subword captions
        # (stat_textCLIP_input.py:33), so a regenerated table is guaranteed
        # row-identical to a reference-generated one on the same corpus
        # rather than silently counting truncated buffers.
        ids = tokenizer.tokenize(text, truncate=False)[0]
        counter.update(int(i) for i in ids)
    data = np.array(sorted(counter.items()), dtype=np.int64)
    return data


def save_vocab_usage(data: np.ndarray, output_dir: str) -> None:
    """Write byID/byfreq npy (+ readable txt) tables.

    Row ordering: byID ascending by token id (reference
    stat_textCLIP_input.py:53-54); byfreq descending by count with ties
    broken by ascending id. The reference uses
    ``arr[arr[:, 1].argsort()[::-1]]`` (:40-45) whose tie permutation is a
    numpy-quicksort internals artifact — NOT reproducible across numpy
    versions (verified: replaying the exact expression on the shipped byID
    counts under numpy 2.x does not reproduce the shipped byfreq tie order).
    We use a deterministic lexsort instead, which reproduces the layout
    rows every consumer depends on — row 0 = pad, rows 2/3 = SOT/EOT (the
    SOT/EOT counts tie and ascending-id ordering puts SOT first, matching
    the shipped tables) — and is stable across environments. Because a
    regenerated table can therefore differ from the SHIPPED one in
    equal-count tail-row order (changing the original<->reduced id mapping
    a trained checkpoint baked in), the shipped reference tables are
    vendored in assets/{flickr,coco}_stat/ and regeneration is only for new
    corpora. (txt files are written as ints for readability; the npy is the
    contract ``clip.reduce_subword_embbedding`` consumes.)
    """
    os.makedirs(output_dir, exist_ok=True)
    data = data[data[:, 0].argsort()]
    by_id = data
    by_freq = data[np.lexsort((data[:, 0], -data[:, 1]))]
    np.save(os.path.join(output_dir, "text_clip_vocab_usage_byID.npy"), by_id)
    np.save(
        os.path.join(output_dir, "text_clip_vocab_usage_byfreq.npy"), by_freq
    )
    for name, arr in [("byID", by_id), ("byfreq", by_freq)]:
        with open(
            os.path.join(output_dir, f"text_clip_vocab_usage_{name}.txt"), "w"
        ) as f:
            for tok_id, count in arr:
                f.write(f"{tok_id} {count}\n")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", choices=["flickr", "coco"], required=True)
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--split_prefix", default="SpokenCOCO")
    parser.add_argument("--bpe_path", default=None)
    args = parser.parse_args()

    from ..models.tokenizer import CLIPTokenizer
    from .datasets import FlickrDataset, SpokenCOCODataset

    tokenizer = CLIPTokenizer(args.bpe_path)
    texts = []
    if args.dataset == "flickr":
        for split in ("train", "dev", "test"):
            ds = FlickrDataset(args.dataset_root, ["text"], split=split)
            texts += [e["text"] for e in ds.data]
    else:
        for split in ("train", "val", "test"):
            ds = SpokenCOCODataset(
                args.dataset_root, ["text"], split=split,
                split_prefix=args.split_prefix,
            )
            texts += [e["text"] for e in ds.data]
    data = compute_vocab_usage(texts, tokenizer)
    save_vocab_usage(data, args.output_dir)
    print(f"saved vocab usage for {len(data)} subwords to {args.output_dir}")


if __name__ == "__main__":
    main()
