"""Scratch bench: full training-step throughput (fwd+bwd+Adam, both branches,
frozen towers) on one chip at various batch / conv-chunk settings.

Run: python scripts/bench_train_step.py [batch chunk]...
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAV_LEN = 102400
STEPS = 5


def run(batch, chunk):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.training import (
        build_optimizer,
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    cfg = _flagship_config()
    cfg.audio_encoder.conv_batch_chunk = chunk
    model = SpeechCLIPModel(cfg)
    state = None
    rng = np.random.default_rng(0)
    batch_data = {
        "wav": jnp.asarray(rng.standard_normal((batch, WAV_LEN)).astype(np.float32)),
        "wav_len": jnp.asarray(
            rng.integers(WAV_LEN // 2, WAV_LEN + 1, batch).astype(np.int32)
        ),
        "image": jnp.asarray(
            rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)
        ),
        "id": jnp.asarray(np.arange(batch) % max(batch // 5, 1)),
    }

    params, _ = model.init(jax.random.key(0))
    tx, _ = build_optimizer(cfg, model.trainable_mask(params))
    del params
    state = create_train_state(model, tx, jax.random.key(1))
    step = jit_train_step(make_train_step(model, tx))

    try:
        state, metrics = step(state, batch_data)
        float(metrics["train_loss"])  # sync
    except Exception as e:
        print(f"batch={batch} chunk={chunk}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        state, metrics = step(state, batch_data)
        float(metrics["train_loss"])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(
        f"train batch={batch} chunk={chunk}: {med*1e3:.1f} ms"
        f" -> {batch/med:.1f} utt/s/chip (loss {float(metrics['train_loss']):.3f})"
    )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    pairs = list(zip(args[::2], args[1::2])) or [(256, 0), (512, 256)]
    for b, c in pairs:
        run(b, c)
