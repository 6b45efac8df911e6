"""Generic s3prl-style upstream registry.

Capability equivalent of the reference's ``S3prlSpeechEncoderPlus``
(avssl/module/speech_encoder_plus.py:110-316), which drives *any* s3prl hub
model: the downsample rate is discovered from the upstream and defaults to
160 (:146-149), ``out_dim`` and the hidden-state count are probed with a
dummy wav (:200-206), and feature selection accepts "all" /
"weighted_sum" / "hidden_states" / "last_hidden_state" / an index list
(:292-306).

Here an upstream is a small host-side object exposing the same contract to
``SpeechCLIPModel``:

- ``cfg.encoder_embed_dim`` / ``cfg.num_hidden_states`` — static (JAX needs
  shapes at trace time; the reference's runtime probe becomes a config
  attribute),
- ``cfg.downsample_rate`` — 160 unless the upstream says otherwise,
- ``init(rng) -> params`` and
  ``apply(params, wav, wav_len, rng, train) -> (hidden_states, feat_len)``
  with the tuple-of-(B, T, D) hidden-state convention shared with
  models/hubert.py; ``feat_len = round(len / downsample_rate)`` clamped
  (reference :286-290).

The HuBERT family keeps its dedicated fairseq-contract implementation in
models/hubert.py (downsample 320); ``resolve_upstream`` returns None for
those names so the caller takes that path. The non-HuBERT contract witness
is **apc** — the model family the reference's own tests parametrize
alongside hubert (test/test_speech_encoder.py:43-57): an 80-dim log-mel
frontend at 10 ms hop (downsample 160, the s3prl default) feeding a stack
of unidirectional GRU layers. Pretrained s3prl weights are unavailable
offline; ``pretrained: false`` random init is itself a supported reference
configuration (speech_encoder_plus.py:151-152).

TPU notes: the mel frontend is one framed matmul pipeline (rFFT + mel
filterbank as a dense (F, M) matmul on the MXU); the GRU precomputes all
input projections as a single large (B*T, 3H) matmul and scans only the
recurrent half — ``lax.scan`` keeps the graph static for XLA.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.basic import Params, linear

S3PRL_DEFAULT_DOWNSAMPLE = 160  # reference speech_encoder_plus.py:149


# ---------------------------------------------------------------------------
# log-mel frontend
# ---------------------------------------------------------------------------
def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int = 16000
) -> np.ndarray:
    """(n_fft//2+1, n_mels) HTK-style triangular mel filterbank (host-side
    constant, baked into the jitted graph)."""

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    n_freqs = n_fft // 2 + 1
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sample_rate / 2), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sample_rate).astype(np.int64)
    fb = np.zeros((n_freqs, n_mels), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = bins[m], bins[m + 1], bins[m + 2]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[k, m] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[k, m] = (hi - k) / (hi - ctr)
    return fb


def log_mel(
    wav: jnp.ndarray,  # (B, L) f32
    n_mels: int = 80,
    win_length: int = 400,  # 25 ms @ 16 kHz
    hop_length: int = 160,  # 10 ms @ 16 kHz -> downsample 160
    n_fft: int = 512,
) -> jnp.ndarray:
    """(B, L//hop, n_mels) log-mel features. The wav is right-padded by
    win - hop samples so a length-L input yields exactly L//hop frames and
    the reference's ``round(len/downsample)`` length formula stays within
    bounds."""
    b, l = wav.shape
    wav = jnp.pad(wav.astype(jnp.float32), ((0, 0), (0, win_length - hop_length)))
    n_frames = l // hop_length
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(win_length)[None, :]
    frames = wav[:, idx]  # (B, N, win)
    window = jnp.asarray(np.hanning(win_length).astype(np.float32))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    power = jnp.square(jnp.abs(spec))  # (B, N, n_fft//2+1)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft))
    mel = jnp.maximum(power @ fb, 1e-10)
    return jnp.log(mel)


# ---------------------------------------------------------------------------
# GRU stack (torch gate order/math: r, z, n — convert/from_torch compatible)
# ---------------------------------------------------------------------------
def gru_layer_init(rng: jax.Array, in_dim: int, hidden: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    bound = 1.0 / math.sqrt(hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    return {
        "w_ih": u(k1, (in_dim, 3 * hidden)),
        "w_hh": u(k2, (hidden, 3 * hidden)),
        "b_ih": u(k3, (3 * hidden,)),
        "b_hh": u(k4, (3 * hidden,)),
    }


def gru_layer_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> (B, T, H) unidirectional GRU.

    The input half of every gate is one big (B*T, 3H) matmul up front (MXU);
    the scan body only does the (B, H) @ (H, 3H) recurrent matmul.
    """
    h_dim = params["w_hh"].shape[0]
    gates_in = (
        x @ params["w_ih"].astype(x.dtype) + params["b_ih"].astype(x.dtype)
    )  # (B, T, 3H)
    w_hh = params["w_hh"].astype(x.dtype)
    b_hh = params["b_hh"].astype(x.dtype)

    def step(h, gi):
        gh = h @ w_hh + b_hh
        ir, iz, inn = jnp.split(gi, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(inn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    h0 = jnp.zeros((x.shape[0], h_dim), x.dtype)
    _, out = jax.lax.scan(step, h0, gates_in.transpose(1, 0, 2))
    return out.transpose(1, 0, 2)


# ---------------------------------------------------------------------------
# APC upstream
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class APCConfig:
    n_mels: int = 80
    encoder_embed_dim: int = 512  # GRU hidden size (s3prl apc out_dim)
    num_layers: int = 3
    downsample_rate: int = S3PRL_DEFAULT_DOWNSAMPLE
    win_length: int = 400
    hop_length: int = 160

    @property
    def num_hidden_states(self) -> int:
        # one state per GRU layer (homogeneous dims for weighted-sum)
        return self.num_layers


def apc_init(rng: jax.Array, cfg: APCConfig) -> Params:
    keys = jax.random.split(rng, cfg.num_layers + 1)
    bound = 1.0 / math.sqrt(cfg.n_mels)
    prenet = {
        "w": jax.random.uniform(
            keys[0], (cfg.n_mels, cfg.encoder_embed_dim), jnp.float32, -bound, bound
        ),
        "b": jnp.zeros((cfg.encoder_embed_dim,), jnp.float32),
    }
    layers = [
        gru_layer_init(
            keys[i + 1],
            cfg.encoder_embed_dim,
            cfg.encoder_embed_dim,
        )
        for i in range(cfg.num_layers)
    ]
    return {"prenet": prenet, "layers": layers}


def apc_apply(
    params: Params,
    cfg: APCConfig,
    wav: jnp.ndarray,  # (B, L)
    wav_lengths: jnp.ndarray,  # (B,) int
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    del rng, train  # no dropout in the APC stack
    compute_dtype = wav.dtype
    mel = log_mel(
        wav, cfg.n_mels, cfg.win_length, cfg.hop_length
    ).astype(compute_dtype)
    x = linear(params["prenet"], mel)
    states = []
    for layer in params["layers"]:
        x = gru_layer_apply(layer, x)
        states.append(x)
    # reference length formula round(len/rate), clamped (:286-290)
    feat_len = jnp.clip(
        jnp.round(wav_lengths / cfg.downsample_rate).astype(jnp.int32),
        0,
        mel.shape[1],
    )
    return tuple(states), feat_len


# ---------------------------------------------------------------------------
# CPC upstream — the HETEROGENEOUS witness (per-layer hidden sizes differ)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class CPCConfig:
    """CPC-style upstream (s3prl name ``modified_cpc``): a strided conv
    encoder z followed by a GRU autoregressive context network c — the two
    hidden states have DIFFERENT dims (z: conv_dim, c: context_dim), the
    case the generic S3prlSpeechEncoderPlus contract must survive
    (reference speech_encoder_plus.py:292-306: such upstreams cannot use
    weighted_sum; feature selection is an index list / named key).
    Real CPC geometry: conv strides (5, 4, 2, 2, 2) -> downsample 160."""

    conv_dim: int = 512
    context_dim: int = 256
    conv_strides: tuple = (5, 4, 2, 2, 2)
    conv_kernels: tuple = (10, 8, 4, 4, 4)
    downsample_rate: int = S3PRL_DEFAULT_DOWNSAMPLE

    @property
    def encoder_embed_dim(self) -> int:
        # out_dim of the LAST state (the probe contract probes the final
        # state's dim, speech_encoder_plus.py:200-206)
        return self.context_dim

    @property
    def num_hidden_states(self) -> int:
        return 2  # (z, c)

    @property
    def hidden_state_dims(self) -> tuple:
        return (self.conv_dim, self.context_dim)


def cpc_init(rng: jax.Array, cfg: CPCConfig) -> Params:
    keys = jax.random.split(rng, len(cfg.conv_strides) + 1)
    convs = []
    in_ch = 1
    for i, (k, s) in enumerate(zip(cfg.conv_kernels, cfg.conv_strides)):
        bound = 1.0 / math.sqrt(in_ch * k)
        convs.append(
            {
                "w": jax.random.uniform(
                    keys[i], (k, in_ch, cfg.conv_dim), jnp.float32, -bound, bound
                ),
                "b": jnp.zeros((cfg.conv_dim,), jnp.float32),
            }
        )
        in_ch = cfg.conv_dim
    gru = gru_layer_init(keys[-1], cfg.conv_dim, cfg.context_dim)
    return {"convs": convs, "gru": gru}


def cpc_apply(
    params: Params,
    cfg: CPCConfig,
    wav: jnp.ndarray,  # (B, L)
    wav_lengths: jnp.ndarray,  # (B,) int
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """-> ((z (B, T, conv_dim), c (B, T, context_dim)), feat_len) —
    heterogeneous per-layer dims."""
    del rng, train
    x = wav[:, :, None]  # (B, L, 1) NWC
    for conv, k, s in zip(params["convs"], cfg.conv_kernels, cfg.conv_strides):
        x = jax.lax.conv_general_dilated(
            x,
            conv["w"].astype(x.dtype),
            window_strides=(s,),
            padding=[(k // 2, k // 2)],  # SAME-ish: L_out = ceil(L/s)
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + conv["b"].astype(x.dtype)
        x = jax.nn.relu(x)
    z = x
    c = gru_layer_apply(params["gru"], z)
    feat_len = jnp.clip(
        jnp.round(wav_lengths / cfg.downsample_rate).astype(jnp.int32),
        0,
        z.shape[1],
    )
    return (z, c), feat_len


def _cpc_upstream(name: str, overrides: Optional[Dict] = None) -> Upstream:
    cfg = CPCConfig(**(overrides or {}))
    return Upstream(
        name=name,
        cfg=cfg,
        init=lambda rng: cpc_init(rng, cfg),
        apply=lambda params, wav, wav_len, rng=None, train=False: cpc_apply(
            params, cfg, wav, wav_len, rng, train
        ),
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Upstream:
    """Host-side upstream handle: the S3prlSpeechEncoderPlus contract."""

    name: str
    cfg: object  # has encoder_embed_dim / num_hidden_states / downsample_rate
    init: callable  # (rng) -> params
    apply: callable  # (params, wav, wav_len, rng, train) -> (states, feat_len)


def _apc_upstream(name: str, overrides: Optional[Dict] = None) -> Upstream:
    cfg = APCConfig(**(overrides or {}))
    return Upstream(
        name=name,
        cfg=cfg,
        init=lambda rng: apc_init(rng, cfg),
        apply=lambda params, wav, wav_len, rng=None, train=False: apc_apply(
            params, cfg, wav, wav_len, rng, train
        ),
    )


_REGISTRY = {
    "apc": _apc_upstream,
    "modified_cpc": _cpc_upstream,
}


def resolve_upstream(
    name: str, overrides: Optional[Dict] = None
) -> Optional[Upstream]:
    """None for the hubert family (handled natively by models/hubert.py with
    the fairseq all-hidden-states contract); an Upstream for registered
    generic names; raises for unknown names — the reference would fail
    inside s3prl.hub the same way, just later (getattr(hub, name),
    speech_encoder_plus.py:145)."""
    if name.startswith("hubert"):
        return None
    if name in _REGISTRY:
        return _REGISTRY[name](name, overrides)
    raise NotImplementedError(
        f"s3prl upstream {name!r} is not in the offline registry "
        f"(available: hubert family, {sorted(_REGISTRY)})"
    )
