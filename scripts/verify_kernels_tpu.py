"""Verification: kernel path vs XLA path, end to end, on real TPU.

Encodes a batch through the flagship model twice — attention backend
"auto" (fused Pallas kernels) and "xla" — and reports feature cosine and
retrieval agreement against a random 5k gallery. Run after any kernel
change; expected: top-1 agreement 1.000, top-10 overlap ~1.000, mean
cosine ~1.0 (bf16 rounding differences only).

Run: python scripts/verify_kernels_tpu.py [BATCH [cascaded]]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
CASCADED = len(sys.argv) > 2 and sys.argv[2] == "cascaded"


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.ops import attention_backend
    from speechclip_tpu.ops.basic import l2_normalize

    cfg = _flagship_config()
    if CASCADED:
        cfg.model_settings.parallel_objective_weight = 0.0
    else:
        cfg.model_settings.cascaded_objective_weight = 0.0
    cfg.audio_encoder.conv_batch_chunk = min(BATCH, 256)
    model = SpeechCLIPModel(cfg)
    params, state = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((BATCH, 102400)).astype(np.float32))
    wav_len = jnp.asarray(
        rng.integers(51200, 102401, BATCH).astype(np.int32)
    )
    gallery = np.asarray(
        l2_normalize(
            jnp.asarray(rng.standard_normal((5000, 512)).astype(np.float32))
        )
    )

    def encode(params, wav, wav_len):
        out = model.encode_speech(params, state, wav, wav_len)
        key = "cascaded_audio_feat" if CASCADED else "parallel_audio_feat"
        return l2_normalize(out[key].astype(jnp.float32))

    feats = {}
    for backend in ("auto", "xla"):
        with attention_backend(backend):
            feats[backend] = np.asarray(jax.jit(encode)(params, wav, wav_len))

    fa, fx = feats["auto"], feats["xla"]
    ra = np.argsort(-(fa @ gallery.T), axis=1)
    rx = np.argsort(-(fx @ gallery.T), axis=1)
    cos = (fa * fx).sum(1)
    top1 = float((ra[:, 0] == rx[:, 0]).mean())
    top10 = float(
        np.mean(
            [len(set(ra[i, :10]) & set(rx[i, :10])) / 10 for i in range(BATCH)]
        )
    )
    print(
        f"mean cos {cos.mean():.6f} min {cos.min():.6f}  "
        f"top1 agree {top1:.3f}  top10 overlap {top10:.3f}"
    )
    assert top1 >= 0.99 and top10 >= 0.98, "kernel path diverged from XLA"


if __name__ == "__main__":
    main()
