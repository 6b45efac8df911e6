"""Scratch bench: encode throughput for model variants on one chip.

Variants: base-parallel (the headline), base-cascaded (adds kw attention,
VQ, CLIP text tower), large-parallel (HuBERT-large + ViT-L/14 dims).
Random weights — this measures compute, not quality.

Timings are single-shot (NOT the CLAUDE.md fori_loop amortization): at
390-900 ms per batch the ~15-30 ms dispatch overhead is a 2-7% pessimistic
bias, acceptable for variant-level comparisons; do not use this script for
sub-100 ms measurements.

Run: python scripts/bench_variants.py {base_par|base_casc|large_par|large_casc} BATCH
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "base_casc"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 256
WAV_LEN = 102400
STEPS = 5


def main():
    import jax
    import jax.numpy as jnp

    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.ops.basic import l2_normalize

    from speechclip_tpu.config import bench_variant_config

    try:
        cfg = bench_variant_config(VARIANT)
    except ValueError as e:
        raise SystemExit(str(e))
    cfg.audio_encoder.conv_batch_chunk = 256

    model = SpeechCLIPModel(cfg)
    params, state = model.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((BATCH, WAV_LEN)).astype(np.float32))
    wav_len = jnp.asarray(
        rng.integers(WAV_LEN // 2, WAV_LEN + 1, BATCH).astype(np.int32)
    )

    @jax.jit
    def encode(params, state, wav, wav_len):
        out = model.encode_speech(params, state, wav, wav_len)
        feats = [
            v
            for k, v in out.items()
            if k.endswith("audio_feat") and v is not None
        ]
        return sum(jnp.sum(l2_normalize(f.astype(jnp.float32))) for f in feats)

    try:
        float(encode(params, state, wav, wav_len))
    except Exception as e:
        print(f"{VARIANT} b{BATCH}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return
    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        float(encode(params, state, wav, wav_len))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(f"{VARIANT} b{BATCH}: {med*1e3:.1f} ms -> {BATCH/med:.1f} utt/s/chip")


if __name__ == "__main__":
    main()
