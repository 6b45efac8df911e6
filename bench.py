"""Headline benchmark: utterances/sec/chip, encode + retrieval.

Measures the flagship inference path on one chip — SpeechCLIP base
(HuBERT-base + ViT-B/32, parallel branch): 6.4 s waveforms (the reference's
max_audio_len crop, config/.../spchclp_p.yaml:104) -> HuBERT all-hidden-states
-> weighted sum -> branch transformer -> projection -> L2 norm -> similarity
scores against a 5k-image gallery (Flickr8k-test scale) -> top-10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline normalizes against an estimated A100 PyTorch reference of
250 utt/s/GPU for the same path (the reference publishes no throughput
numbers — SURVEY.md §6; this constant is the documented assumption: fp16
torch HuBERT-base inference at batch 256 with pad-to-longest plus retrieval
scoring). The driver's target is >=5x => vs_baseline >= 5.
"""

import json
import time

import numpy as np

A100_BASELINE_UTT_PER_SEC = 250.0

BATCH = 1024  # conv frontend chunked (conv_batch_chunk=256) to fit HBM
WAV_LEN = 102400  # 6.4 s @ 16 kHz
GALLERY = 5000
STEPS = 8


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.models import branches
    from speechclip_tpu.ops.basic import l2_normalize

    cfg = _flagship_config()
    cfg.model_settings.cascaded_objective_weight = 0.0  # flagship = parallel base
    cfg.audio_encoder.conv_batch_chunk = 256  # bound conv0 intermediate
    model = SpeechCLIPModel(cfg)
    params, state = model.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((BATCH, WAV_LEN)).astype(np.float32))
    wav_len = jnp.asarray(
        rng.integers(WAV_LEN // 2, WAV_LEN + 1, BATCH).astype(np.int32)
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
        # scalar checksum: forces full execution; fetching it is the sync
        # point (block_until_ready does not synchronize on the axon tunnel)
        return jnp.sum(feat) + jnp.sum(top10).astype(jnp.float32)

    # warmup / compile; host fetch = synchronization
    float(encode_and_retrieve(params, wav, wav_len, gallery))

    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        float(encode_and_retrieve(params, wav, wav_len, gallery))
        times.append(time.perf_counter() - t0)

    med = float(np.median(times))
    utt_per_sec = BATCH / med
    print(
        json.dumps(
            {
                "metric": "utterances_per_sec_per_chip_encode_retrieval",
                "value": round(utt_per_sec, 2),
                "unit": "utt/s/chip (6.4s audio, parallel base)",
                "vs_baseline": round(utt_per_sec / A100_BASELINE_UTT_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
