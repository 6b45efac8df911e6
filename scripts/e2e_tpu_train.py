"""End-to-end CLI training on real TPU at production dims.

Builds a synthetic Flickr-layout corpus (N wav/jpg pairs at 224px / 16 kHz)
and drives the REAL CLI surface:

  run_task.py TrainKWClip_GeneralTransformer --config <generated> --train
  run_task.py ... --test --resume <last>

at full HuBERT-base + ViT-B/32 dims (random init — this validates the
trainer/bucketing/kernels/checkpoint/eval machinery on hardware, not
retrieval quality). Expect the contrastive loss to fall from ~ln(B) toward
the id-masked floor within tens of steps.

Run: python scripts/e2e_tpu_train.py [--large] [NSTEPS [BATCH]]
(~30-60 min, mostly remote compiles)

--large swaps in the reference's 4-GPU dims (HuBERT-large + ViT-L/14,
d_model 1024, normalize_hiddenstates, trainable temperature) so the FULL
trainer — bucketing, image cache, checkpointing, eval — is validated on
hardware at large dims, not just the bare train step
(scripts/bench_train_budget.py --variant large_*).
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# argv parsing lives under __main__ (this module is imported by
# scripts/bench_eval_loop.py, which has its own argv)
NSTEPS = 12
BATCH = 32
LARGE = False
N_IMAGES = 96
SR = 16000
WAV_SECONDS = 3  # one length -> one bucket -> ONE train-step compile


def write_corpus(root):
    from PIL import Image

    os.makedirs(os.path.join(root, "flickr_audio", "wavs"), exist_ok=True)
    os.makedirs(os.path.join(root, "Images"), exist_ok=True)
    rng = np.random.default_rng(0)
    captions = []
    names = [f"syn{i:04d}" for i in range(N_IMAGES)]
    for i, name in enumerate(names):
        img = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(root, "Images", f"{name}.jpg"))
        for n in range(2):
            n_samp = WAV_SECONDS * SR
            wav = (rng.standard_normal(n_samp) * 0.1).astype(np.float32)
            pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2")
            import wave

            with wave.open(
                os.path.join(root, "flickr_audio", "wavs", f"{name}_{n}.wav"),
                "wb",
            ) as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(SR)
                f.writeframes(pcm.tobytes())
            captions.append(f"{name}.jpg#{n}\tsynthetic caption {i} {n} .")
    with open(os.path.join(root, "Flickr8k.token.txt"), "w") as f:
        f.write("\n".join(captions))
    n_tr = N_IMAGES - 16
    with open(os.path.join(root, "Flickr_8k.trainImages.txt"), "w") as f:
        f.write("\n".join(f"{n}.jpg" for n in names[:n_tr]))
    with open(os.path.join(root, "Flickr_8k.devImages.txt"), "w") as f:
        f.write("\n".join(f"{n}.jpg" for n in names[n_tr : n_tr + 8]))
    with open(os.path.join(root, "Flickr_8k.testImages.txt"), "w") as f:
        f.write("\n".join(f"{n}.jpg" for n in names[n_tr + 8 :]))


def write_synthetic_vocab(path):
    """Synthetic reduced-vocab table with the SHIPPED pad/SOT/EOT row
    layout ([0, <other>, 49406, 49407, rest...] — the single place this
    convention is encoded for the TPU drive scripts; bench_eval_loop
    imports it rather than carrying a copy that could drift)."""
    rng = np.random.default_rng(3)
    others = rng.choice(np.arange(1, 49406), size=509, replace=False)
    ids = np.concatenate([[0, others[0], 49406, 49407], others[1:]])
    freq = np.arange(len(ids), 0, -1)
    np.save(path, np.stack([ids, freq], axis=1).astype(np.int64))
    return path


def write_config(path, dataset_root, exp_dir, vocab_npy):
    import yaml

    d_model = 1024 if LARGE else 768
    ffn = 4096 if LARGE else 3072
    cfg = {
        "data": {
            "dataset": {
                "name": "flickr",
                "dataset_root": dataset_root,
                "text_file": "Flickr8k.token.txt",
                "load_image": True,
                "load_audio": True,
                "tokenizeText": False,
            },
            "batch_size": BATCH,
            "dev_batch_size": 16,
        },
        "model_settings": {
            "cascaded_objective_weight": 1.0,
            "parallel_objective_weight": 1.0,
            "parallel_branch": {
                "transformer_type": "TransformerEncoder",
                "transformer_args": {
                    "n_layers": 1, "d_model": d_model, "nhead": 8,
                    "dim_feedforward": ffn, "dropout": 0.1,
                    "activation": "gelu", "layer_norm_eps": 1.0e-5,
                    "batch_first": True, "norm_first": False,
                },
                "need_projection": True,
            },
            "cascaded_branch": {
                "type": "KW_CascadedBranch",
                "transformer_type": "MultiheadAttentionAndNorm",
                "transformer_args": {
                    "n_layers": 1, "d_model": d_model, "nhead": 1,
                    "dim_feedforward": ffn, "dropout": 0.1,
                },
                "keyword": {
                    "number": 8,
                    "batchnorms": {
                        "type": "eachKw", "std_scale": 1.0,
                        "learnable": True, "parallel": True,
                    },
                },
                "vq": {
                    "type": "SimpleVectorQuantizer",
                    "args": {
                        "temp": "fixed=0.1", "time_first": True,
                        "use_gumbel": False, "hard": True,
                    },
                },
            },
        },
        "cl_loss": {
            "type": "MaskedContrastiveLoss",
            "args": {
                "temperature": 0.07,
                "temperature_trainable": bool(LARGE),
            },
        },
        "retrieval": {"audio_feat_src": "parallel", "recall_at": [1, 5, 10]},
        "clip": {
            "name": "ViT-L/14" if LARGE else "ViT-B/32",
            "image_encoder_trainable": False,
            "text_encoder_trainable": False,
            "reduce_subword_embbedding": vocab_npy,
        },
        "audio_encoder": {
            "type": "FairseqHubert",
            "name": "hubert_large_ll60k" if LARGE else "hubert",
            "pretrained": False,
            "trainable": False,
            "feat_select_idx": "weighted_sum",
            "layer_drop": 0.0,
            "max_audio_len": 48000,
            "normalize_hiddenstates": bool(LARGE),
            "conv_batch_chunk": 64,
            "optim": {"name": "Adam", "args": {"lr": 1e-3, "weight_decay": 1e-6}},
            "scheduler": {
                "name": "linear_warmup_decay",
                "warmup": 4, "max_step": max(NSTEPS, 8), "final_lr": 1e-8,
            },
        },
        "trainer": {
            "max_steps": NSTEPS,
            "gradient_clip_val": 4,
            "check_val_every_n_epoch": 1000,  # skip mid-train eval compiles
            "precision": 16,
            "fast_rng": True,
            # the shipped-config default operating point: exercises the
            # per-fit frozen image-feature cache path on real hardware
            # (precompute unique images -> loader skips image decode ->
            # step consumes cached features)
            "cache_image_features": True,
            "logger": "none",
            "log_every_n_steps": 1,
            "default_root_dir": exp_dir,
        },
        "log_setting": {"log_detokenize_results": False},
        "seed": 7122,
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def main():
    work = tempfile.mkdtemp(prefix="e2e_tpu_")
    corpus = os.path.join(work, "corpus")
    exp = os.path.join(work, "exp")
    print("corpus at", corpus, flush=True)
    write_corpus(corpus)

    vocab_npy = write_synthetic_vocab(os.path.join(work, "vocab_byfreq.npy"))

    cfg_path = os.path.join(work, "config.yaml")
    write_config(cfg_path, corpus, exp, vocab_npy)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t = subprocess.run(
        [sys.executable, "run_task.py", "TrainKWClip_GeneralTransformer",
         "--config", cfg_path, "--train"],
        cwd=repo,
    )
    assert t.returncode == 0, "train failed"

    metrics_path = os.path.join(exp, "metrics.jsonl")
    losses = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if "train_loss" in rec:
                losses.append(rec["train_loss"])
    print(f"train_loss first->last: {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)
    assert losses[-1] < losses[0], "loss did not decrease"

    t = subprocess.run(
        [sys.executable, "run_task.py", "TrainKWClip_GeneralTransformer",
         "--config", cfg_path, "--test",
         "--resume", os.path.join(exp, "ckpts", "last")],
        cwd=repo,
    )
    assert t.returncode == 0, "test eval failed"
    print("E2E TPU TRAIN OK", flush=True)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--large"]
    LARGE = "--large" in sys.argv[1:]
    if len(argv) > 0:
        NSTEPS = int(argv[0])
    if len(argv) > 1:
        BATCH = int(argv[1])
    main()
