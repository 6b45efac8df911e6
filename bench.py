"""Headline benchmark: utterances/sec/chip, encode + retrieval.

Measures the flagship inference path on one chip — SpeechCLIP base
(HuBERT-base + ViT-B/32, parallel branch): 6.4 s waveforms (the reference's
max_audio_len crop, config/.../spchclp_p.yaml:104) -> HuBERT all-hidden-states
-> weighted sum -> branch transformer -> projection -> L2 norm -> similarity
scores against a 5k-image gallery (Flickr8k-test scale) -> top-10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
"extras" carries the non-flagship driver-visible numbers so regressions in
those paths are caught round-over-round (VERDICT r1 weak #4):
  cascaded_base_utt_per_sec  — cascaded branch encode (kw attention, VQ,
                               CLIP text tower) at batch 256
  hubert_large_utt_per_sec   — HuBERT-large parallel encode at batch 256
  train_step_ms_b256         — full train step (fwd+bwd+Adam, both branches,
                               frozen towers) at batch 256

vs_baseline normalizes against an estimated A100 PyTorch reference of
250 utt/s/GPU for the same path (the reference publishes no throughput
numbers — SURVEY.md §6; this constant is the documented assumption: fp16
torch HuBERT-base inference at batch 256 with pad-to-longest plus retrieval
scoring). The driver's target is >=5x => vs_baseline >= 5.

Set SPEECHCLIP_BENCH_HEADLINE_ONLY=1 to skip the extras (fast iteration).
"""

import json
import os
import time

import numpy as np

A100_BASELINE_UTT_PER_SEC = 250.0

BATCH = 1024  # conv frontend chunked (conv_batch_chunk=256) to fit HBM
WAV_LEN = 102400  # 6.4 s @ 16 kHz
GALLERY = 5000
STEPS = 8
EXTRA_BATCH = 256
EXTRA_STEPS = 4


def _median_time(fn, steps):
    """fn must fetch a scalar to host (block_until_ready does not
    synchronize on the axon tunnel)."""
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _make_wavs(rng, batch):
    import jax.numpy as jnp

    wav = jnp.asarray(rng.standard_normal((batch, WAV_LEN)).astype(np.float32))
    wav_len = jnp.asarray(
        rng.integers(WAV_LEN // 2, WAV_LEN + 1, batch).astype(np.int32)
    )
    return wav, wav_len


def headline():
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
    wav, wav_len = _make_wavs(rng, BATCH)
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
        # scalar checksum: forces full execution; fetching it is the sync point
        return jnp.sum(feat) + jnp.sum(top10).astype(jnp.float32)

    float(encode_and_retrieve(params, wav, wav_len, gallery))  # compile
    med = _median_time(
        lambda: float(encode_and_retrieve(params, wav, wav_len, gallery)), STEPS
    )
    return BATCH / med


def encode_variant(variant):
    """utt/s for a non-flagship encode path at EXTRA_BATCH (single-shot
    timing: at >200 ms/batch the ~15-30 ms dispatch overhead is a small
    pessimistic bias)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.ops.basic import l2_normalize

    cfg = _flagship_config()
    cfg.audio_encoder.conv_batch_chunk = 256
    if variant == "base_casc":
        cfg.model_settings.parallel_objective_weight = 0.0
    elif variant == "large_par":
        cfg.model_settings.cascaded_objective_weight = 0.0
        cfg.audio_encoder.name = "hubert_large_ll60k"
        cfg.audio_encoder.normalize_hiddenstates = True
        cfg.audio_encoder.normalize_type = "s3prl"
        cfg.clip.name = "ViT-L/14"
        for b in ("parallel_branch", "cascaded_branch"):
            cfg.model_settings[b].transformer_args.d_model = 1024
            cfg.model_settings[b].transformer_args.dim_feedforward = 4096
    else:
        raise ValueError(variant)

    model = SpeechCLIPModel(cfg)
    params, state = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    wav, wav_len = _make_wavs(rng, EXTRA_BATCH)

    @jax.jit
    def encode(params, state, wav, wav_len):
        out = model.encode_speech(params, state, wav, wav_len)
        feats = [
            v for k, v in out.items() if k.endswith("audio_feat") and v is not None
        ]
        return sum(jnp.sum(l2_normalize(f.astype(jnp.float32))) for f in feats)

    float(encode(params, state, wav, wav_len))  # compile
    med = _median_time(
        lambda: float(encode(params, state, wav, wav_len)), EXTRA_STEPS
    )
    return EXTRA_BATCH / med


def train_step_ms():
    """Full training-step latency (ms) at batch 256, conv chunk off."""
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
    model = SpeechCLIPModel(cfg)
    rng = np.random.default_rng(0)
    wav, wav_len = _make_wavs(rng, EXTRA_BATCH)
    batch_data = {
        "wav": wav,
        "wav_len": wav_len,
        "image": jnp.asarray(
            rng.standard_normal((EXTRA_BATCH, 224, 224, 3)).astype(np.float32)
        ),
        "id": jnp.asarray(np.arange(EXTRA_BATCH) % (EXTRA_BATCH // 5)),
    }
    params, _ = model.init(jax.random.key(0))
    tx, _ = build_optimizer(cfg, model.trainable_mask(params))
    del params
    state = create_train_state(model, tx, jax.random.key(1))
    step = jit_train_step(make_train_step(model, tx))

    state, metrics = step(state, batch_data)
    float(metrics["train_loss"])  # compile + sync

    def one():
        nonlocal state
        state, metrics = step(state, batch_data)
        float(metrics["train_loss"])

    return _median_time(one, EXTRA_STEPS) * 1e3


def main():
    # production configuration: the shipped configs set trainer.fast_rng
    # (rbg PRNG — dropout masks ~28 ms/step cheaper than threefry at b256);
    # must be set before any key is created, hence here
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    def checkpoint_result(result):
        # the axon remote-compile latency is large and variable (minutes per
        # graph, docs/DESIGN_NOTES.md); persist progress so a caller-side
        # timeout still leaves the measured numbers on disk
        with open(os.path.join(os.path.dirname(__file__), "bench_last.json"), "w") as f:
            json.dump(result, f)

    utt_per_sec = headline()
    result = {
        "metric": "utterances_per_sec_per_chip_encode_retrieval",
        "value": round(utt_per_sec, 2),
        "unit": "utt/s/chip (6.4s audio, parallel base)",
        "vs_baseline": round(utt_per_sec / A100_BASELINE_UTT_PER_SEC, 3),
    }
    checkpoint_result(result)
    if os.environ.get("SPEECHCLIP_BENCH_HEADLINE_ONLY") != "1":
        extras = {}
        result["extras"] = extras
        for key, fn in [
            ("cascaded_base_utt_per_sec", lambda: encode_variant("base_casc")),
            ("hubert_large_utt_per_sec", lambda: encode_variant("large_par")),
            ("train_step_ms_b256", train_step_ms),
        ]:
            try:
                extras[key] = round(fn(), 2)
            except Exception as e:  # a broken variant must not hide the headline
                extras[key] = f"FAILED {type(e).__name__}: {str(e)[:120]}"
            checkpoint_result(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
