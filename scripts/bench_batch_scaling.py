"""Scratch bench: encode throughput vs batch size with chunked conv frontend.

Methodology per docs/DESIGN_NOTES.md: host scalar fetch = sync point;
single-shot timings fine at >100 ms batch latencies (dispatch ~15-30 ms).
Run: python scripts/bench_batch_scaling.py [batch chunk]...
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAV_LEN = 102400
GALLERY = 5000
STEPS = 5


def run(batch, chunk):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.models import branches
    from speechclip_tpu.ops.basic import l2_normalize

    cfg = _flagship_config()
    cfg.model_settings.cascaded_objective_weight = 0.0
    cfg.audio_encoder.conv_batch_chunk = chunk
    model = SpeechCLIPModel(cfg)
    params, _ = model.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, WAV_LEN)).astype(np.float32))
    wav_len = jnp.asarray(
        rng.integers(WAV_LEN // 2, WAV_LEN + 1, batch).astype(np.int32)
    )
    gallery = l2_normalize(
        jnp.asarray(rng.standard_normal((GALLERY, 512)).astype(np.float32))
    )

    @jax.jit
    def encode_and_retrieve(params, wav, wav_len, gallery):
        audio_feat, audio_len = model.forward_audio(params, wav, wav_len)
        feat = branches.parallel_branch_apply(
            params["parallel_branch"],
            model.config.model_settings.parallel_branch,
            audio_feat,
            audio_len,
        )
        feat = l2_normalize(feat.astype(jnp.float32))
        scores = feat @ gallery.T
        _, top10 = jax.lax.top_k(scores, 10)
        return jnp.sum(feat) + jnp.sum(top10).astype(jnp.float32)

    try:
        float(encode_and_retrieve(params, wav, wav_len, gallery))
    except Exception as e:  # OOM etc
        print(f"batch={batch} chunk={chunk}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        float(encode_and_retrieve(params, wav, wav_len, gallery))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(
        f"batch={batch} chunk={chunk}: {med*1e3:.1f} ms -> {batch/med:.1f} utt/s/chip"
    )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    pairs = list(zip(args[::2], args[1::2])) or [(256, 0), (512, 128), (512, 64)]
    for b, c in pairs:
        run(b, c)
