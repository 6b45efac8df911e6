#!/usr/bin/env python3
"""Embedding-extraction example (reference example.py:1-40 contract):

load a checkpoint, extract per-layer hidden states and speech embeddings
for a list of waveforms.

  python3 example.py --ckpt exp/run/ckpts/last [--wav path.wav ...]
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--ckpt",
        default=None,
        help="checkpoint dir or reference .ckpt (random init if omitted)",
    )
    parser.add_argument("--wav", nargs="*", default=[], help="wav files (random if none)")
    parser.add_argument(
        "--platform",
        default=None,
        help="jax platform override (e.g. cpu — env vars alone do not work "
        "on machines that pin a platform via sitecustomize)",
    )
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from speechclip_tpu.models.speechclip import SpeechCLIPModel
    from speechclip_tpu.data import read_wav

    if args.ckpt is None:
        # no checkpoint: random init on the flagship config (demo of the
        # API surface without downloaded assets)
        from speechclip_tpu.config import flagship_config

        config = flagship_config()
        model = SpeechCLIPModel(config)
        params, model_state = model.init(jax.random.key(0))
    else:
        # shared restore path (reference Lightning .ckpt conversion OR an
        # orbax run dir with its PRNG-impl guard — training/checkpoint.py)
        from speechclip_tpu.training.checkpoint import load_any_checkpoint

        model, params, model_state = load_any_checkpoint(args.ckpt)

    if args.wav:
        wavs = [read_wav(p) for p in args.wav]
    else:
        rng = np.random.default_rng(0)
        wavs = [rng.standard_normal(16000 * 2).astype(np.float32) for _ in range(2)]

    max_len = max(len(w) for w in wavs)
    wav = np.zeros((len(wavs), max_len), np.float32)
    wav_len = np.array([len(w) for w in wavs])
    for i, w in enumerate(wavs):
        wav[i, : len(w)] = w
    wav, wav_len = jnp.asarray(wav), jnp.asarray(wav_len)

    # reference model.feature_extractor_s3prl(wav=...)
    last_hidden, hidden_states = model.extract_hidden_states(params, wav, wav_len)
    print(f"#hidden states: {len(hidden_states)}")
    print(f"last hidden state shape: {last_hidden.shape}")

    # reference model.encode_speech(wav=...)
    output = model.encode_speech(params, model_state, wav, wav_len)
    for key in ("parallel_audio_feat", "cascaded_audio_feat"):
        if key in output:
            print(f"{key}: {output[key].shape}")
    if "keywords" in output:
        print(f"keywords: {output['keywords'].shape}")


if __name__ == "__main__":
    main()
