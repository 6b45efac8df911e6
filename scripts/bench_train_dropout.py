"""Scratch bench: dropout's share of the train step at batch 256.

Variants (one process, sequential compiles):
  base    — shipped config (branch dropout 0.1, threefry PRNG)
  rbg     — same but jax_default_prng_impl=rbg (trainer.fast_rng)
  nodrop  — branch dropout 0.0 (isolates mask generation + the XLA
            attention fallback the active-dropout path forces)

Run: python scripts/bench_train_dropout.py [VARIANTS [BATCH [ITERS]]]
NOTE: rbg must be the FIRST variant if included (PRNG impl must be set
before any key exists), so the script runs it in a subprocess instead.
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = (sys.argv[1] if len(sys.argv) > 1 else "base,nodrop").split(",")
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 256
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
WAV_LEN = 102400


def measure(variant):
    import jax
    import jax.numpy as jnp

    if variant == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.training import (
        build_optimizer,
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    cfg = _flagship_config()
    cfg.audio_encoder.conv_batch_chunk = min(BATCH, 256)
    if variant == "nodrop":
        for b in ("parallel_branch", "cascaded_branch"):
            cfg.model_settings[b].transformer_args.dropout = 0.0

    model = SpeechCLIPModel(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "wav": jnp.asarray(
            rng.standard_normal((BATCH, WAV_LEN)).astype(np.float32)
        ),
        "wav_len": jnp.asarray(
            rng.integers(WAV_LEN // 2, WAV_LEN + 1, BATCH).astype(np.int32)
        ),
        "image": jnp.asarray(
            rng.standard_normal((BATCH, 224, 224, 3)).astype(np.float32)
        ),
        "id": jnp.asarray(np.arange(BATCH, dtype=np.int32) // 5),
    }
    params, _ = model.init(jax.random.key(0))
    tx, _ = build_optimizer(cfg, model.trainable_mask(params))
    del params
    state = create_train_state(model, tx, jax.random.key(1))
    step = jit_train_step(make_train_step(model, tx))

    state, metrics = step(state, batch)
    float(metrics["train_loss"])  # compile + sync
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        float(metrics["train_loss"])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(f"{variant:8s} b{BATCH}: {med*1e3:.1f} ms/step", flush=True)
    return med


if __name__ == "__main__":
    if "rbg" in VARIANTS and len(VARIANTS) > 1:
        # rbg needs a clean process (PRNG impl is set pre-key-creation)
        for v in VARIANTS:
            subprocess.run(
                [sys.executable, __file__, v, str(BATCH), str(ITERS)],
                check=False,
            )
    else:
        for v in VARIANTS:
            measure(v)
