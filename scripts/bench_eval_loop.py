"""Scratch bench: end-to-end Trainer.validate throughput on TPU.

Builds a synthetic fixed-length corpus (N wav/jpg pairs, 3 s, 224 px),
runs the REAL eval loop (BucketedLoader ingest -> padded eval step ->
host trim -> retrieval) at a given data.eval_batch_size, and reports
utterances/sec including host ingest. Quantifies the round-1 VERDICT
weak-#5 knob (dev_batch_size 8 -> eval_batch_size 256).

Run: python scripts/bench_eval_loop.py [N_SAMPLES [EVAL_BATCH [u8] [imgcache]]]
("u8" enables data.dataset.on_device_preprocess: uint8 images + int16 wav
over the interconnect, resize/normalize/rescale on device. "imgcache"
enables trainer.cache_image_features: the frozen gallery features are
computed once and reused every validate — no image decode, no image H2D,
no per-step ViT. The second timed validate() shows the steady-state.)
"""

import os
import sys
import tempfile
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
EVAL_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 256
MODES = set(sys.argv[3:])  # combinable: the two knobs are orthogonal
_unknown = MODES - {"u8", "imgcache"}
if _unknown:
    raise SystemExit(
        f"unknown mode(s) {sorted(_unknown)}; valid modes: u8, imgcache"
    )
U8 = "u8" in MODES  # uint8 device-side preprocess
IMGCACHE = "imgcache" in MODES  # per-fit frozen image-feature cache
SR = 16000


def main():
    from scripts.e2e_tpu_train import write_config, write_corpus
    import scripts.e2e_tpu_train as e2e

    e2e.N_IMAGES = N // 2
    work = tempfile.mkdtemp(prefix="eval_bench_")
    corpus = os.path.join(work, "corpus")
    write_corpus(corpus)
    # repurpose (nearly) the whole corpus as the dev split
    names = [f"syn{i:04d}.jpg" for i in range(e2e.N_IMAGES - 16)]
    with open(os.path.join(corpus, "Flickr_8k.devImages.txt"), "w") as f:
        f.write("\n".join(names))

    vocab_npy = e2e.write_synthetic_vocab(
        os.path.join(work, "vocab_byfreq.npy")
    )
    cfg_path = os.path.join(work, "config.yaml")
    write_config(cfg_path, corpus, os.path.join(work, "exp"), vocab_npy)

    import jax

    from speechclip_tpu.config import load_config
    from speechclip_tpu.training.trainer import Trainer
    from speechclip_tpu.training.train_step import create_train_state, place_state

    config = load_config(cfg_path)
    config.data.eval_batch_size = EVAL_BATCH
    config.data.dataset.dataset_root = corpus
    if U8:
        # ship uint8 over the interconnect; resize+normalize on device
        config.data.dataset.on_device_preprocess = True
    # ALWAYS set explicitly: write_config (shared with e2e_tpu_train)
    # hardcodes cache_image_features: True into the generated yaml, so
    # gating only the True case made the flag a no-op — the "uncached"
    # baseline silently measured the cached path
    config.trainer.cache_image_features = bool(IMGCACHE)
    trainer = Trainer(config)
    state = create_train_state(
        trainer.model, trainer.tx, jax.random.key(0)
    )
    state = place_state(state, trainer.mesh)

    loader = trainer.build_eval_loader("dev")
    n = len(loader.dataset)
    print(f"dev set: {n} samples, eval batch {loader.batch_size}", flush=True)

    trainer.validate(state, loader)  # compile + warm
    t0 = time.perf_counter()
    metrics = trainer.validate(state, loader)
    dt = time.perf_counter() - t0
    print(
        f"validate: {dt:.2f} s for {n} utts -> {n/dt:.1f} utt/s end-to-end "
        f"(val_loss {metrics['val_loss']:.3f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
