"""HuBERT speech encoder, TPU-native.

Re-implements the capability of the reference's fairseq-backed encoder
(avssl/module/speech_encoder_plus.py:319-634 and its monkey-patched
customHubertForward :67-107 / custom extract_features :29-64): waveform in,
ALL transformer hidden states out (13 for base, 25 for large).

Architecture (fairseq HubertModel contract):
  wav (B, L)
    -> 7x strided 1-D convolutions, 320x downsampling           [conv frontend]
       (mode "default": GroupNorm after conv0; "layer_norm": LN after each)
    -> LayerNorm(512) -> Linear(512 -> D)                        [post-extract]
    -> + grouped conv positional embedding (k=128, g=16, GELU)   [pos_conv]
    -> (post-norm: LayerNorm)  -> N transformer layers           [encoder]
  hidden_states = [pre-layer input] + [every layer output]

TPU design notes:
- static shapes: the wav buffer length is a bucket constant; per-utterance
  lengths ride along and become masks (ops.masking);
- convs run as ``lax.conv_general_dilated`` in NWC layout so XLA tiles them
  onto the MXU; everything downstream is (B, T, D) matmuls;
- pos_conv weight-norm is folded into a plain conv weight at conversion
  time (the tower is frozen in every shipped config);
- masked positions are zeroed before pos_conv (reference index_put, :33).

Weights load via speechclip_tpu.convert (fairseq checkpoint or HuggingFace
transformers HubertModel state dict).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.basic import Params, dropout, gelu, layer_norm, linear
from ..ops.masking import conv_frame_valid_lengths, key_padding_mask, valid_mask


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    # conv frontend: (channels, kernel, stride) per layer; 320x total
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    extractor_mode: str = "default"  # "default" (GN on conv0) | "layer_norm"
    conv_bias: bool = False
    encoder_embed_dim: int = 768
    encoder_layers: int = 12
    encoder_ffn_dim: int = 3072
    encoder_heads: int = 12
    layer_norm_first: bool = False  # base: post-norm; large: pre-norm
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    normalize_waveform: bool = False  # task.cfg.normalize (large: True)
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    layerdrop: float = 0.0
    downsample_rate: int = 320
    # Rematerialize encoder layers on the backward pass (jax.checkpoint).
    # Only matters when the encoder is trainable (fine-tune / unfreeze_layers
    # paths, reference speech_encoder_plus.py:404-446): activations of the
    # 12/24 layers are recomputed instead of stored, trading ~1 extra forward
    # of FLOPs for O(layers) less HBM. No effect on frozen/eval paths.
    remat: bool = False
    # Batch chunk size for the conv frontend; 0 = whole batch at once.
    # The conv0 intermediate (B, ~L/5, 512) is the largest activation in the
    # model and is what bounds batch size (b512 at 6.4 s OOMs a v5e chip);
    # chunking runs the 7-conv chain lax.map-sequentially over batch chunks
    # so only one chunk's intermediates are live. Exact: every frontend op
    # (convs, GN-as-instance-norm, LN, GELU) is per-sample.
    conv_batch_chunk: int = 0

    @property
    def num_hidden_states(self) -> int:
        return self.encoder_layers + 1


HUBERT_BASE = HubertConfig()
HUBERT_LARGE = HubertConfig(
    conv_bias=True,  # layer_norm-extractor models carry conv biases
    # (facebook/hubert-large-ll60k config: conv_bias=true); the converters
    # are presence-driven either way, so this only affects random init and
    # config-chosen parity tests. NOTE: this adds conv-bias leaves to the
    # params pytree — an orbax checkpoint of a hubert_large run saved
    # before this change (none were released) would need a b=None
    # migration to structure-match the restore target
    encoder_embed_dim=1024,
    encoder_layers=24,
    encoder_ffn_dim=4096,
    encoder_heads=16,
    layer_norm_first=True,
    extractor_mode="layer_norm",
    normalize_waveform=True,
)

NAMED_CONFIGS = {
    "hubert": HUBERT_BASE,
    "hubert_base": HUBERT_BASE,
    "hubert_large_ll60k": HUBERT_LARGE,
}


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------
def hubert_init(rng: jax.Array, cfg: HubertConfig) -> Params:
    """Random init (reference supports pretrained=False via init_weights,
    speech_encoder_plus.py:397-398). Real runs load converted weights."""
    n_conv = len(cfg.conv_layers)
    keys = iter(jax.random.split(rng, n_conv + cfg.encoder_layers * 6 + 8))

    convs: List[Params] = []
    in_ch = 1
    for i, (ch, k, _s) in enumerate(cfg.conv_layers):
        w = jax.random.normal(next(keys), (k, in_ch, ch), jnp.float32) * (
            1.0 / (k * in_ch) ** 0.5
        )
        layer: Params = {"w": w}
        layer["b"] = jnp.zeros((ch,), jnp.float32) if cfg.conv_bias else None
        if cfg.extractor_mode == "layer_norm" or (
            cfg.extractor_mode == "default" and i == 0
        ):
            layer["norm"] = {
                "scale": jnp.ones((ch,), jnp.float32),
                "bias": jnp.zeros((ch,), jnp.float32),
            }
        convs.append(layer)
        in_ch = ch

    d, f = cfg.encoder_embed_dim, cfg.encoder_ffn_dim

    def lin(key, i, o):
        return {
            "w": jax.random.normal(key, (i, o), jnp.float32) * (i**-0.5),
            "b": jnp.zeros((o,), jnp.float32),
        }

    def ln(dim):
        return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}

    layers = []
    for _ in range(cfg.encoder_layers):
        layers.append(
            {
                "self_attn": {
                    "in_proj": {
                        "w": jax.random.normal(next(keys), (d, 3 * d), jnp.float32)
                        * (d**-0.5),
                        "b": jnp.zeros((3 * d,), jnp.float32),
                    },
                    "out_proj": lin(next(keys), d, d),
                },
                "self_attn_layer_norm": ln(d),
                "fc1": lin(next(keys), d, f),
                "fc2": lin(next(keys), f, d),
                "final_layer_norm": ln(d),
            }
        )

    c_last = cfg.conv_layers[-1][0]
    pos_w = jax.random.normal(
        next(keys),
        (cfg.pos_conv_kernel, d // cfg.pos_conv_groups, d),
        jnp.float32,
    ) * (0.02)

    return {
        "feature_extractor": convs,
        "layer_norm": ln(c_last),
        "post_extract_proj": (
            lin(next(keys), c_last, d) if c_last != d else None
        ),
        "encoder": {
            "pos_conv": {"w": pos_w, "b": jnp.zeros((d,), jnp.float32)},
            "layer_norm": ln(d),
            "layers": layers,
        },
    }


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------
def _group_norm_per_channel(x: jnp.ndarray, norm: Params) -> jnp.ndarray:
    """fairseq mode="default": GroupNorm(C, C) == per-channel instance norm
    over time. x: (B, T, C).

    Bandwidth note: this runs on the conv0 output (B, ~20k, 512) — the
    largest activation in the model. Stats accumulate in f32 via reduction
    dtype (no materialized f32 copy of x); the normalization itself applies
    in the compute dtype with f32 per-channel scalars folded into one
    multiply-add: y = x * a + b with a = scale/sqrt(var+eps),
    b = bias - mean * a."""
    mean = jnp.mean(x, axis=1, keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(
        jnp.square(x.astype(jnp.float32)), axis=1, keepdims=True,
        dtype=jnp.float32,
    )
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    a = norm["scale"] * jax.lax.rsqrt(var + 1e-5)  # (B, 1, C) f32
    b = norm["bias"] - mean * a
    return (x.astype(jnp.float32) * a + b).astype(x.dtype)


def conv_feature_extractor(
    params: List[Params], cfg: HubertConfig, wav: jnp.ndarray
) -> jnp.ndarray:
    """wav (B, L) -> features (B, T, C_last). VALID padding, stride per layer
    (fairseq ConvFeatureExtractionModel contract).

    TPU note: XLA's native strided-conv lowering measures near MXU speed of
    light at these shapes in NWC layout (conv1 k=3 s=2 512ch: ~156 TFLOP/s
    bf16 on v5e); an im2col unfold+matmul reformulation was benchmarked 3-5x
    slower — keep the native convs. Memory: ``cfg.conv_batch_chunk`` bounds
    the live conv0 intermediate by running the chain over batch chunks."""
    chunk = cfg.conv_batch_chunk
    b = wav.shape[0]
    if chunk and b > chunk:
        pad = (-b) % chunk
        if pad:
            wav = jnp.concatenate([wav, jnp.zeros((pad, wav.shape[1]), wav.dtype)])
        stacked = wav.reshape((b + pad) // chunk, chunk, wav.shape[1])
        out = jax.lax.map(lambda w: _conv_chain(params, cfg, w), stacked)
        return out.reshape(-1, *out.shape[2:])[:b]
    return _conv_chain(params, cfg, wav)


def _conv_chain(
    params: List[Params], cfg: HubertConfig, wav: jnp.ndarray
) -> jnp.ndarray:
    x = wav[:, :, None]  # (B, L, 1) NWC
    for i, (layer, (_ch, k, s)) in enumerate(zip(params, cfg.conv_layers)):
        x = jax.lax.conv_general_dilated(
            x,
            layer["w"].astype(x.dtype),
            window_strides=(s,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if layer.get("b") is not None:
            x = x + layer["b"].astype(x.dtype)
        if cfg.extractor_mode == "default" and i == 0:
            x = _group_norm_per_channel(x, layer["norm"])
        elif cfg.extractor_mode == "layer_norm":
            x = layer_norm(layer["norm"], x)
        x = gelu(x)
    return x


def pos_conv_apply(params: Params, cfg: HubertConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Grouped conv positional embedding with SamePad trim + GELU
    (reference custom extract_features :35-37).

    Under a data-parallel mesh the grouped conv dispatches through an
    explicit shard_map over the data axis: XLA's SPMD partitioner cannot
    batch-partition a ``feature_group_count`` conv, so without this it
    ALL-GATHERS the full (B, T, D) hidden states and runs the conv
    replicated on every chip (observed in the lowered HLO,
    tests/test_scaling_hlo.py — ~250 MB/step of gather + 8x redundant
    compute at production dims on data=8). The conv is batch-pointwise,
    so the per-shard mapping is exact."""

    def core(x, w, b):
        pad = cfg.pos_conv_kernel // 2
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=cfg.pos_conv_groups,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        y = y + b.astype(x.dtype)
        if cfg.pos_conv_kernel % 2 == 0:  # SamePad removes the trailing step
            y = y[:, :-1, :]
        return gelu(y)

    from ..kernels._dispatch import data_shard_map, mesh_plan
    from ..ops.attention import get_kernel_mesh

    plan = mesh_plan(get_kernel_mesh(), x.shape[0], lambda b: True)
    if plan is not None and plan != "single":
        return data_shard_map(core, plan, n_arrays=3, n_sharded=1)(
            x, params["w"], params["b"]
        )
    return core(x, params["w"], params["b"])


# ffn_block on/off for the fused layer path (scripts/bench_ffn_block.py
# measures the kernel ~1.5 ms/layer SLOWER than XLA's chain in isolation at
# base dims, but e2e encode is faster with it — pipeline effects; keep a
# switch so the trade stays measurable)
_FFN_KERNEL = True


def set_ffn_kernel(on: bool) -> None:
    global _FFN_KERNEL
    _FFN_KERNEL = bool(on)


def _fused_encoder_layer(
    params: Params,
    cfg: HubertConfig,
    x: jnp.ndarray,
    frame_lens: Optional[jnp.ndarray],
) -> Optional[jnp.ndarray]:
    """Whole encoder layer as two fused Pallas calls when eligible
    (kernels/fused_layer.py has the gate list); None -> unfused path."""
    from ..kernels.fused_layer import fused_encoder_layer

    return fused_encoder_layer(
        x,
        frame_lens,
        heads=cfg.encoder_heads,
        mode="pre" if cfg.layer_norm_first else "post",
        eps=1e-5,
        attn=params["self_attn"],
        fc1=params["fc1"],
        fc2=params["fc2"],
        ln1=params["self_attn_layer_norm"],
        ln2=params["final_layer_norm"],
        use_ffn_kernel=_FFN_KERNEL,
    )


def encoder_layer_apply(
    params: Params,
    cfg: HubertConfig,
    x: jnp.ndarray,
    kpm: Optional[jnp.ndarray],
    rng: Optional[jax.Array],
    train: bool,
    frame_lens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """fairseq TransformerSentenceEncoderLayer (post- or pre-norm)."""
    # fused path: inference, or training with every dropout disabled (the
    # kernels' custom VJPs give exact gradients; in-kernel dropout would
    # not be reproducible in the XLA backward recompute)
    no_dropout = (
        cfg.dropout == 0.0
        and cfg.attention_dropout == 0.0
        and cfg.activation_dropout == 0.0
    )
    # eligible masking: per-batch valid lengths, or no mask at all (both
    # kernels support lens=None); only an unstructured kpm without lens
    # forces the unfused path
    if (not train or no_dropout) and (frame_lens is not None or kpm is None):
        fused = _fused_encoder_layer(params, cfg, x, frame_lens)
        if fused is not None:
            return fused
    if rng is not None:
        r_attn, r1, r2, r3 = jax.random.split(rng, 4)
    else:
        r_attn = r1 = r2 = r3 = None

    def attn(h):
        out, _ = multi_head_attention(
            params["self_attn"],
            h,
            h,
            h,
            num_heads=cfg.encoder_heads,
            key_padding_mask=kpm,
            key_valid_lens=frame_lens,
            dropout_rate=cfg.attention_dropout,
            rng=r_attn,
            train=train,
        )
        return dropout(r1, out, cfg.dropout, train)

    def ffn(h):
        h = gelu(linear(params["fc1"], h))
        h = dropout(r2, h, cfg.activation_dropout, train)
        h = linear(params["fc2"], h)
        return dropout(r3, h, cfg.dropout, train)

    if cfg.layer_norm_first:
        x = x + attn(layer_norm(params["self_attn_layer_norm"], x))
        x = x + ffn(layer_norm(params["final_layer_norm"], x))
    else:
        x = layer_norm(params["self_attn_layer_norm"], x + attn(x))
        x = layer_norm(params["final_layer_norm"], x + ffn(x))
    return x


def _encoder_prelude(
    params: Params,
    cfg: HubertConfig,
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Everything before the transformer layers: waveform normalize, conv
    frontend, post-extract projection, pos_conv (+ post-norm LayerNorm).
    Returns (x, kpm, frame_lens); x is hidden state 0. Shared by
    ``hubert_apply`` and the frozen weighted-sum path below."""
    compute_dtype = wav.dtype

    if cfg.normalize_waveform:
        # per-utterance layer_norm over VALID samples only (the reference
        # normalizes each wav before padding, speech_encoder_plus.py:507-508)
        vm = valid_mask(wav_lengths, wav.shape[1]).astype(jnp.float32)
        n = jnp.maximum(jnp.sum(vm, axis=1, keepdims=True), 1.0)
        w32 = wav.astype(jnp.float32) * vm
        mean = jnp.sum(w32, axis=1, keepdims=True) / n
        var = jnp.sum(jnp.square((w32 - mean) * vm), axis=1, keepdims=True) / n
        wav = (((wav.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)) * vm).astype(
            compute_dtype
        )

    feats = conv_feature_extractor(params["feature_extractor"], cfg, wav)
    feats = layer_norm(params["layer_norm"], feats)
    if params.get("post_extract_proj") is not None:
        feats = linear(params["post_extract_proj"], feats)

    num_frames = feats.shape[1]
    frame_lens = conv_frame_valid_lengths(wav_lengths, wav.shape[1], num_frames)
    kpm = key_padding_mask(frame_lens, num_frames)

    # zero padded positions before pos_conv (reference index_put, :33)
    x = jnp.where(kpm[..., None], jnp.zeros_like(feats), feats)
    x = x + pos_conv_apply(params["encoder"]["pos_conv"], cfg, x)
    if not cfg.layer_norm_first:
        x = layer_norm(params["encoder"]["layer_norm"], x)
    return x, kpm, frame_lens


def hubert_apply(
    params: Params,
    cfg: HubertConfig,
    wav: jnp.ndarray,  # (B, L) f32, zero-padded
    wav_lengths: jnp.ndarray,  # (B,) int
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Full forward. Returns (hidden_states tuple of (B, T, D), feat_lengths).

    hidden_states mirrors the reference layer_results contract
    (speech_encoder_plus.py:47-56): entry 0 is the encoder input after
    pos_conv (+ LayerNorm for post-norm), then one entry per layer output.
    feat_lengths is round(len/320) clamped (reference :604-611).
    """
    x, kpm, frame_lens = _encoder_prelude(params, cfg, wav, wav_lengths)
    num_frames = x.shape[1]
    if train and cfg.dropout > 0 and rng is not None:
        rng, r = jax.random.split(rng)
        x = dropout(r, x, cfg.dropout, train)

    hidden_states = [x]
    n_layers = len(params["encoder"]["layers"])
    if rng is not None:
        layer_rngs = list(jax.random.split(rng, 2 * n_layers))
    else:
        layer_rngs = [None] * (2 * n_layers)
    layer_fn = encoder_layer_apply
    if train and cfg.remat:
        # cfg (frozen dataclass) and the train flag are static
        layer_fn = jax.checkpoint(encoder_layer_apply, static_argnums=(1, 5))
    for i, layer in enumerate(params["encoder"]["layers"]):
        y = layer_fn(
            layer, cfg, x, kpm, layer_rngs[2 * i], train, frame_lens
        )
        if train and cfg.layerdrop > 0 and layer_rngs[2 * i + 1] is not None:
            keep = jax.random.bernoulli(
                layer_rngs[2 * i + 1], 1.0 - cfg.layerdrop
            )
            x = jnp.where(keep, y, x)
        else:
            x = y
        hidden_states.append(x)

    from ..ops.masking import hubert_feature_lengths

    feat_lens = hubert_feature_lengths(
        wav_lengths, cfg.downsample_rate, num_frames
    )
    return tuple(hidden_states), feat_lens


def conv_output_length(cfg: HubertConfig, n_samples: int) -> int:
    """Static conv-frontend output length (VALID padding, per-layer stride)."""
    length = n_samples
    for (_ch, k, s) in cfg.conv_layers:
        length = (length - k) // s + 1
    return length


# ---------------------------------------------------------------------------
# frozen weighted-sum with backward recompute (memory: O(2 states), not O(N))
# ---------------------------------------------------------------------------
def _process_state(h: jnp.ndarray, norm_type: Optional[str]) -> jnp.ndarray:
    """Per-state normalization applied before the weighted sum — mirrors
    normalize_hidden_states (method1/method2, reference
    speech_encoder_plus.py:572-592) and the s3prl per-state LayerNorm mode
    of WeightedSumLayer (avssl/module/weighted_sum.py:24-31)."""
    if norm_type is None:
        return h
    if norm_type == "method1":
        return h / (
            jnp.linalg.norm(h.astype(jnp.float32), axis=-1, keepdims=True) + 1e-8
        )
    if norm_type == "method2":
        return h / jnp.mean(
            jnp.linalg.norm(h.astype(jnp.float32), axis=-1), axis=-1
        )[:, None, None]
    if norm_type == "s3prl":
        return layer_norm(None, h)
    raise NotImplementedError(norm_type)


def _wsum_pass(
    cfg: HubertConfig,
    norm_type: Optional[str],
    hubert_params: Params,
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    w: jnp.ndarray,  # (N,) f32 softmax weights
    g: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One deterministic (eval-mode) encoder pass that folds the per-state
    weighted-sum work INTO the layer loop, so at most two hidden states are
    live at any point instead of all N.

    g=None (forward): returns the f32 weighted-sum accumulator — identical
    accumulation order to weighted_sum_apply's unrolled chain.
    g given (backward): returns dots (N,) f32 with dots[i] = <g, state_i> —
    the only residual-dependent quantity the weighted-sum VJP needs; each
    state is contracted to a scalar the moment it is produced and freed.
    """
    x, kpm, frame_lens = _encoder_prelude(hubert_params, cfg, wav, wav_lengths)
    g32 = None if g is None else g.astype(jnp.float32)

    def consume(i: int, h: jnp.ndarray):
        s = _process_state(h, norm_type).astype(jnp.float32)
        if g32 is None:
            return w[i] * s
        return jnp.sum(g32 * s)

    acc = consume(0, x)
    outs = [acc] if g is not None else None
    for i, layer in enumerate(hubert_params["encoder"]["layers"]):
        # scheduling tie: make this layer's input depend on the PREVIOUS
        # state's consumption, so XLA cannot run the whole layer chain
        # first and only then the N consumptions — that order is exactly
        # the N-state live set this path exists to avoid (measured:
        # without the tie, the b256 large step still carried the ~4 GB
        # stack in its temp buffers). optimization_barrier expresses the
        # ordering as a pure scheduling edge — unlike the earlier
        # arithmetic zero-add (x + 0*prev), an inf/NaN in the f32
        # accumulator cannot leak into the next layer's input as 0*inf=NaN
        # (ADVICE r4).
        prev = acc if g is None else outs[-1]
        x, _ = jax.lax.optimization_barrier((x, prev))
        x = encoder_layer_apply(layer, cfg, x, kpm, None, False, frame_lens)
        c = consume(i + 1, x)
        if g is None:
            acc = acc + c
        else:
            outs.append(c)
    if g is None:
        return acc
    return jnp.stack(outs)


def _frozen_wsum_primal(cfg, norm_type, ws_params, hubert_params, wav, wav_lengths):
    w = jax.nn.softmax(ws_params["weights"].astype(jnp.float32))
    acc = _wsum_pass(cfg, norm_type, hubert_params, wav, wav_lengths, w)
    # match weighted_sum_apply's output dtype: the processed state dtype
    # (f32 after method1/2 promotion, compute dtype otherwise)
    out_dtype = wav.dtype if norm_type in (None, "s3prl") else jnp.float32
    return acc.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _frozen_wsum(static, ws_params, hubert_params, wav, wav_lengths):
    return _frozen_wsum_primal(*static, ws_params, hubert_params, wav, wav_lengths)


def _frozen_wsum_fwd(static, ws_params, hubert_params, wav, wav_lengths):
    out = _frozen_wsum_primal(*static, ws_params, hubert_params, wav, wav_lengths)
    return out, (ws_params, hubert_params, wav, wav_lengths)


def _frozen_wsum_bwd(static, res, g):
    cfg, norm_type = static
    ws_params, hubert_params, wav, wav_lengths = res
    w = jax.nn.softmax(ws_params["weights"].astype(jnp.float32))
    dots = _wsum_pass(cfg, norm_type, hubert_params, wav, wav_lengths, w, g=g)
    # softmax VJP: feat = sum_i softmax(l)_i * s_i  =>
    # dl = w * (dots - <w, dots>)
    d_logits = w * (dots - jnp.sum(w * dots))
    d_ws = {"weights": d_logits.astype(ws_params["weights"].dtype)}
    d_hubert = jax.tree.map(jnp.zeros_like, hubert_params)  # frozen
    import numpy as _np

    d_wav = jnp.zeros_like(wav)
    d_lens = _np.zeros(wav_lengths.shape, dtype=jax.dtypes.float0)
    return d_ws, d_hubert, d_wav, d_lens


_frozen_wsum.defvjp(_frozen_wsum_fwd, _frozen_wsum_bwd)


def hubert_frozen_weighted_sum(
    ws_params: Params,
    hubert_params: Params,
    cfg: HubertConfig,
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    norm_type: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted-sum feature of a FROZEN HuBERT without keeping all N hidden
    states live (``audio_encoder.wsum_remat``).

    The standard path materializes every hidden state until the weighted sum
    consumes them — for hubert_large at b256/6.4 s that stack alone is
    25 x 256 x 320 x 1024 x 2B ≈ 4.2 GB and is what OOMs one v5e chip
    (docs/DESIGN_NOTES.md, large-model budget). Here the forward folds
    ``w_i * state_i`` into a running accumulator inside the layer loop
    (live set: current state + accumulator) and a custom VJP recomputes the
    deterministic frozen encoder on the backward pass, contracting each
    state against the cotangent to a scalar as it is produced:
    grad wrt the weighted-sum logits needs only dots_i = <g, state_i>.
    Cost: one extra eval-mode encoder forward per step; grads are exact
    (the frozen encoder gets zeros, matching stop_gradient semantics in
    training/train_step.py). Only valid when the encoder is frozen — the
    recompute assumes a deterministic (no-dropout) forward and returns no
    encoder-weight gradients.

    Replaces the reference pipeline HuBERT(no_grad) -> WeightedSumLayer
    (speech_encoder_plus.py:558-621) at identical math.
    """
    feat = _frozen_wsum((cfg, norm_type), ws_params, hubert_params, wav, wav_lengths)
    from ..ops.masking import hubert_feature_lengths

    num_frames = conv_output_length(cfg, wav.shape[1])
    feat_lens = hubert_feature_lengths(wav_lengths, cfg.downsample_rate, num_frames)
    return feat, feat_lens


def normalize_hidden_states(
    hidden_states: Tuple[jnp.ndarray, ...], method: str
) -> Tuple[jnp.ndarray, ...]:
    """Optional hidden-state normalization (reference :572-592)."""
    if method == "method1":
        return tuple(
            h / (jnp.linalg.norm(h.astype(jnp.float32), axis=-1, keepdims=True) + 1e-8)
            for h in hidden_states
        )
    if method == "method2":
        return tuple(
            h
            / jnp.mean(
                jnp.linalg.norm(h.astype(jnp.float32), axis=-1), axis=-1
            )[:, None, None]
            for h in hidden_states
        )
    raise NotImplementedError(method)
