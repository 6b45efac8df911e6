"""Length → mask helpers (static-shape friendly).

The reference builds boolean key-padding masks with a Python loop
(avssl/util/data_utils.py:4-20, True = padding). Here masks come from a
broadcasted iota so they trace cleanly under jit with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def key_padding_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """Bool (B, T) mask, True at PADDING positions (torch convention)."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, max_length), 1)
    return pos >= lengths.astype(jnp.int32)[:, None]


def valid_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """Bool (B, T) mask, True at VALID positions."""
    return ~key_padding_mask(lengths, max_length)


def hubert_feature_lengths(
    wav_lengths: jnp.ndarray, downsample_rate: int, max_frames: int
) -> jnp.ndarray:
    """Frame count per utterance: ``round(len/rate)`` clamped to T.

    Mirrors the reference formula (avssl/module/speech_encoder_plus.py:604-611)
    including Python/torch banker's rounding (jnp.rint rounds half-to-even).
    """
    feat_len = jnp.rint(
        wav_lengths.astype(jnp.float32) / float(downsample_rate)
    ).astype(jnp.int32)
    return jnp.minimum(feat_len, max_frames)


def conv_frame_valid_lengths(
    wav_lengths: jnp.ndarray, padded_wav_len: int, num_frames: int
) -> jnp.ndarray:
    """Frame-level valid lengths matching fairseq's forward_padding_mask.

    fairseq drops ``padded_wav_len % num_frames`` trailing samples, splits the
    mask into ``num_frames`` equal chunks and marks a frame as padding iff all
    samples in its chunk are padding. Equivalently, with chunk size
    ``c = padded_wav_len // num_frames``, frame i is valid iff ``i*c < len``:
    valid frames = ceil(min(len, c*num_frames) / c).
    (behavioral contract of HubertModel.forward_padding_mask, invoked at
    reference speech_encoder_plus.py:82)
    """
    chunk = max(padded_wav_len // num_frames, 1)
    clipped = jnp.minimum(wav_lengths.astype(jnp.int32), chunk * num_frames)
    return jnp.minimum(-(-clipped // chunk), num_frames)
