#!/usr/bin/env python3
"""Checkpoint-parity verification harness (SURVEY.md §7 golden tests).

Given a released reference Lightning checkpoint (download_ckpts.sh names)
and the Flickr8k/SpokenCOCO corpus, this tool:

1. converts the checkpoint (speechclip_tpu.convert.reference_ckpt);
2. encodes the dev/test split with the converted model;
3. runs speech<->image retrieval and prints R@1/5/10 both directions plus
   the val_recall_mean_k the checkpoint filename encodes —
   the parity target is within 0.5 points (BASELINE.md).

Requires network-fetched assets; in offline environments this script is the
recipe the parity claim rides on, not a test that can run here.

  python scripts/verify_parity.py --ckpt epoch_131-step_15443-val_recall_mean_1_36.0100.ckpt \
      --dataset_root data/flickr --split dev
"""

import argparse
import logging
import os
import sys

# runnable from any cwd (the documented usage is `python
# scripts/verify_parity.py ...` — without this the script dir shadows the
# repo root and speechclip_tpu is unimportable; caught by
# tests/test_verify_parity.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logging.basicConfig(level=logging.INFO, force=True)
logger = logging.getLogger("verify_parity")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--split", default="dev")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from speechclip_tpu.convert import load_reference_checkpoint
    from speechclip_tpu.data import BucketedLoader, build_dataset
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.ops.retrieval import mutual_retrieval
    from speechclip_tpu.training.evaluation import (
        collect_validation_outputs,
        retrieval_metrics,
    )

    logger.info("converting %s", args.ckpt)
    params, state, config = load_reference_checkpoint(args.ckpt)
    config.set_path("data.dataset.dataset_root", args.dataset_root)
    model = SpeechCLIPModel(config)

    dataset = build_dataset(
        config.data, args.split, image_size=model.clip_cfg.vision.image_size
    )
    loader = BucketedLoader(
        dataset, batch_size=args.batch_size, train=False
    )
    audio_src = config.get_path("retrieval.audio_feat_src", "parallel")

    @jax.jit
    def encode(params, state, wav, wav_len, image):
        batch = {
            "wav": wav,
            "wav_len": wav_len,
            "image": image,
            "id": jnp.zeros((wav.shape[0],), jnp.int32),
        }
        _, _, others, _ = model.forward(params, state, batch)
        feat = (
            others["cascaded_audio_feat"]
            if audio_src == "cascaded"
            else others["parallel_audio_feat"]
        )
        return feat, others["image_feat"]

    outputs = []
    for batch in loader:
        audio_feat, image_feat = encode(
            params,
            state,
            jnp.asarray(batch["wav"]),
            jnp.asarray(batch["wav_len"]),
            jnp.asarray(batch["image"]),
        )
        outputs.append(
            {
                "id": batch["id"],
                "audio_feat": np.asarray(audio_feat),
                "image_feat": np.asarray(image_feat),
            }
        )
    collected = collect_validation_outputs(outputs)
    recall_ab, recall_ba, recall_mean = retrieval_metrics(
        collected, config.get_path("retrieval.recall_at", [1, 5, 10])
    )
    print("speech->image:", recall_ab)
    print("image->speech:", recall_ba)
    print("mean:", recall_mean)
    return 0


if __name__ == "__main__":
    sys.exit(main())
