"""CLIP towers, TPU-native.

Re-implements the capability surface of the reference ClipModel wrapper
(avssl/module/clip_official.py:26-294) over OpenAI-CLIP-architecture towers:

- vision transformer image encoder (``encode_image``)
- causal text transformer (``encode_text``)
- ``encode_keywords`` — the cascaded branch's path into the text tower
  (reference :220-264): a 77-slot buffer with SOT/EOT tokens whose
  positions 1..K are replaced by K keyword embeddings
- reduced-subword-vocabulary mode (reference :61-106): the token embedding
  table is shrunk to the dataset's observed subwords, with
  original<->reduced id maps

Pre-norm residual blocks with QuickGELU; text attention is causal. Weights
convert from OpenAI CLIP or HuggingFace CLIPModel state dicts
(speechclip_tpu.convert).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_attention
from ..ops.basic import Params, layer_norm, linear, quick_gelu


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512


@dataclasses.dataclass(frozen=True)
class CLIPResNetVisionConfig:
    """ModifiedResNet image tower — the RN* half of the reference's CLIP
    name surface (avssl/module/clip_official.py:14-23 accepts RN50/RN101/
    RN50x4/RN50x16/RN50x64 via ``clip.load``). Architecture per the public
    OpenAI CLIP model: a 3-conv stem with blur-free 2x2 average pooling,
    four stages of pre-activation-free bottlenecks whose stride-2 convs are
    replaced by stride-1 conv + 2x2 average pool (anti-aliased downsample),
    and a final AttentionPool2d (mean-query multi-head attention over the
    7x7 feature grid) instead of global average pooling.

    Parity status: pinned against a hand-written torch oracle restating
    the public architecture (tests/torch_ref.py ModifiedResNetTorch; exact
    at tiny and full RN50 dims, randomized weights AND BN running stats).
    Released-weight parity additionally needs the published checkpoints
    (scripts/download_assets.sh --rn; network-blocked in this repo's dev
    environment, see docs/DESIGN_NOTES.md download attempts) — the
    converter consumes them via load_clip_checkpoint unchanged."""

    image_size: int = 224
    width: int = 64  # stem width; stage channels are width*(1,2,4,8)*4
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    heads: int = 32  # attnpool heads (vision_width * 32 // 64)
    output_dim: int = 1024

    @property
    def embed_dim(self) -> int:
        """attnpool input channels (stage-4 output)."""
        return self.width * 32

    @property
    def feature_grid(self) -> int:
        """spatial extent after the 32x downsample (stem 4x + 3 stages 2x)."""
        return self.image_size // 32


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vision: CLIPVisionConfig = CLIPVisionConfig()
    text: CLIPTextConfig = CLIPTextConfig()

    @property
    def embed_dim(self) -> int:
        return self.text.output_dim


CLIP_VIT_B32 = CLIPConfig()
CLIP_VIT_B16 = CLIPConfig(vision=CLIPVisionConfig(patch_size=16))
CLIP_VIT_L14 = CLIPConfig(
    vision=CLIPVisionConfig(
        patch_size=14, width=1024, layers=24, heads=16, output_dim=768
    ),
    text=CLIPTextConfig(width=768, heads=12, output_dim=768),
)

# RN* dims per the published OpenAI checkpoints (clip's build_model derives
# them from the state dict; text heads = width // 64, attnpool heads =
# vision_width * 32 // 64)
CLIP_RN50 = CLIPConfig(
    vision=CLIPResNetVisionConfig(),
    text=CLIPTextConfig(output_dim=1024),
)
CLIP_RN101 = CLIPConfig(
    vision=CLIPResNetVisionConfig(layers=(3, 4, 23, 3), output_dim=512),
    text=CLIPTextConfig(output_dim=512),
)
CLIP_RN50x4 = CLIPConfig(
    vision=CLIPResNetVisionConfig(
        image_size=288, width=80, layers=(4, 6, 10, 6), heads=40, output_dim=640
    ),
    text=CLIPTextConfig(width=640, heads=10, output_dim=640),
)
CLIP_RN50x16 = CLIPConfig(
    vision=CLIPResNetVisionConfig(
        image_size=384, width=96, layers=(6, 8, 18, 8), heads=48, output_dim=768
    ),
    text=CLIPTextConfig(width=768, heads=12, output_dim=768),
)
CLIP_RN50x64 = CLIPConfig(
    vision=CLIPResNetVisionConfig(
        image_size=448,
        width=128,
        layers=(3, 15, 36, 10),
        heads=64,
        output_dim=1024,
    ),
    text=CLIPTextConfig(width=1024, heads=16, output_dim=1024),
)

NAMED_CONFIGS = {
    "RN50": CLIP_RN50,
    "RN101": CLIP_RN101,
    "RN50x4": CLIP_RN50x4,
    "RN50x16": CLIP_RN50x16,
    "RN50x64": CLIP_RN50x64,
    "ViT-B/32": CLIP_VIT_B32,
    "ViT-B/16": CLIP_VIT_B16,
    "ViT-L/14": CLIP_VIT_L14,
}



# ---------------------------------------------------------------------------
# init (random; real runs load converted weights)
# ---------------------------------------------------------------------------
def _block_init(rng: jax.Array, width: int, ffn: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    scale = width**-0.5

    def lin(key, i, o, std):
        return {
            "w": jax.random.normal(key, (i, o), jnp.float32) * std,
            "b": jnp.zeros((o,), jnp.float32),
        }

    def ln(dim):
        return {
            "scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32),
        }

    return {
        "attn": {
            "in_proj": lin(k1, width, 3 * width, scale),
            "out_proj": lin(k2, width, width, scale),
        },
        "ln_1": ln(width),
        "mlp": {"c_fc": lin(k3, width, ffn, scale), "c_proj": lin(k4, ffn, width, scale)},
        "ln_2": ln(width),
    }


def _resnet_init(rng: jax.Array, v: CLIPResNetVisionConfig) -> Params:
    """Random ModifiedResNet visual params (real runs load converted
    weights; shapes and tree layout are the contract here)."""
    n_keys = 8 + sum(v.layers) * 4 + 6
    keys = iter(jax.random.split(rng, n_keys))

    def conv(kh, kw, cin, cout):
        return {
            "w": jax.random.normal(next(keys), (kh, kw, cin, cout), jnp.float32)
            * (kh * kw * cin) ** -0.5
        }

    def bn(dim):
        return {
            "scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32),
            "mean": jnp.zeros((dim,), jnp.float32),
            "var": jnp.ones((dim,), jnp.float32),
        }

    def lin(i, o):
        return {
            "w": jax.random.normal(next(keys), (i, o), jnp.float32) * i**-0.5,
            "b": jnp.zeros((o,), jnp.float32),
        }

    w2 = v.width // 2
    visual: Params = {
        "stem": {
            "conv1": conv(3, 3, 3, w2),
            "bn1": bn(w2),
            "conv2": conv(3, 3, w2, w2),
            "bn2": bn(w2),
            "conv3": conv(3, 3, w2, v.width),
            "bn3": bn(v.width),
        }
    }
    inplanes = v.width
    for stage in range(4):
        planes = v.width * (2**stage)
        blocks = []
        for block in range(v.layers[stage]):
            p = {
                "conv1": conv(1, 1, inplanes, planes),
                "bn1": bn(planes),
                "conv2": conv(3, 3, planes, planes),
                "bn2": bn(planes),
                "conv3": conv(1, 1, planes, planes * 4),
                "bn3": bn(planes * 4),
            }
            # first block of every stage re-projects the identity
            # (stride > 1 or inplanes != planes*4 in the torch Bottleneck)
            if block == 0:
                p["downsample"] = {
                    "conv": conv(1, 1, inplanes, planes * 4),
                    "bn": bn(planes * 4),
                }
            blocks.append(p)
            inplanes = planes * 4
        visual[f"layer{stage + 1}"] = blocks
    ed = v.embed_dim
    visual["attnpool"] = {
        "positional_embedding": jax.random.normal(
            next(keys), (v.feature_grid**2 + 1, ed), jnp.float32
        )
        * ed**-0.5,
        "q_proj": lin(ed, ed),
        "k_proj": lin(ed, ed),
        "v_proj": lin(ed, ed),
        "c_proj": lin(ed, v.output_dim),
    }
    return visual


def clip_init(rng: jax.Array, cfg: CLIPConfig) -> Params:
    # one key per independent draw — reusing a key both directly and as a
    # split source (the pre-round-5 bug: kv seeded the visual positional
    # embedding AND the vision blocks, kt the visual proj AND the text
    # blocks) makes the towers' init streams statistically dependent
    kv, kt, kc, kp, kvpe, kvproj, ke, kpe, ktp = jax.random.split(rng, 9)
    v, t = cfg.vision, cfg.text

    def ln(dim):
        return {
            "scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32),
        }

    if isinstance(v, CLIPResNetVisionConfig):
        visual = _resnet_init(kv, v)
        return {
            "visual": visual,
            "text": _text_init(kt, ke, kpe, ktp, t, ln),
            "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
        }

    grid = v.image_size // v.patch_size
    visual = {
        "conv1": {
            "w": jax.random.normal(
                kc, (v.patch_size, v.patch_size, 3, v.width), jnp.float32
            )
            * (v.width**-0.5)
        },
        "class_embedding": jax.random.normal(kp, (v.width,), jnp.float32)
        * (v.width**-0.5),
        "positional_embedding": jax.random.normal(
            kvpe, (grid * grid + 1, v.width), jnp.float32
        )
        * (v.width**-0.5),
        "ln_pre": ln(v.width),
        "blocks": [
            _block_init(k, v.width, v.width * 4)
            for k in jax.random.split(kv, v.layers)
        ],
        "ln_post": ln(v.width),
        "proj": jax.random.normal(kvproj, (v.width, v.output_dim), jnp.float32)
        * (v.width**-0.5),
    }
    return {
        "visual": visual,
        "text": _text_init(kt, ke, kpe, ktp, t, ln),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


def _text_init(kt, ke, kpe, ktp, t: CLIPTextConfig, ln) -> Params:
    return {
        "token_embedding": jax.random.normal(
            ke, (t.vocab_size, t.width), jnp.float32
        )
        * 0.02,
        "positional_embedding": jax.random.normal(
            kpe, (t.context_length, t.width), jnp.float32
        )
        * 0.01,
        "blocks": [
            _block_init(k, t.width, t.width * 4)
            for k in jax.random.split(kt, t.layers)
        ],
        "ln_final": ln(t.width),
        "text_projection": jax.random.normal(
            ktp, (t.width, t.output_dim), jnp.float32
        )
        * (t.width**-0.5),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _resblock(
    params: Params,
    x: jnp.ndarray,
    heads: int,
    causal: bool,
) -> jnp.ndarray:
    normed = layer_norm(params["ln_1"], x)
    h, _ = multi_head_attention(
        params["attn"],
        normed,
        normed,
        normed,
        num_heads=heads,
        causal=causal,
    )
    x = x + h
    y = layer_norm(params["ln_2"], x)
    y = linear(params["mlp"]["c_proj"], quick_gelu(linear(params["mlp"]["c_fc"], y)))
    return x + y


# --- ModifiedResNet image tower (RN* names) --------------------------------
def _conv2d(w: jnp.ndarray, x: jnp.ndarray, stride: int = 1, padding: int = 0):
    """bias-free 2D conv, NHWC on the MXU (all ModifiedResNet convs are
    bias-free; BN supplies the affine)."""
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _batch_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch BatchNorm2d inference semantics (running stats, eps 1e-5) over
    NHWC channels, folded to one fused multiply-add; f32 stat math."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = p["scale"].astype(jnp.float32) * inv
    bias = p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * scale
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """torch AvgPool2d(k) (no padding, floor mode) over NHWC."""
    if k == 1:
        return x
    s = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        (1, k, k, 1),
        (1, k, k, 1),
        "VALID",
    )
    return (s * (1.0 / (k * k))).astype(x.dtype)


def _bottleneck(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """CLIP's anti-aliased Bottleneck: 1x1 -> 3x3 -> [avgpool(stride)] ->
    1x1(x4), identity via avgpool + 1x1 conv when re-projected; all convs
    stride 1 (the downsample is the avgpool)."""
    out = jax.nn.relu(_batch_norm(p["bn1"], _conv2d(p["conv1"]["w"], x)))
    out = jax.nn.relu(
        _batch_norm(p["bn2"], _conv2d(p["conv2"]["w"], out, padding=1))
    )
    out = _avg_pool(out, stride)
    out = _batch_norm(p["bn3"], _conv2d(p["conv3"]["w"], out))
    if "downsample" in p:
        identity = _batch_norm(
            p["downsample"]["bn"],
            _conv2d(p["downsample"]["conv"]["w"], _avg_pool(x, stride)),
        )
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attention_pool(
    p: Params, v: CLIPResNetVisionConfig, x: jnp.ndarray
) -> jnp.ndarray:
    """AttentionPool2d: prepend the spatial mean as the (single) query
    token, add a learned positional embedding, one round of multi-head
    attention, project to output_dim."""
    b, h, w, c = x.shape
    x = x.reshape(b, h * w, c)
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
    x = x + p["positional_embedding"].astype(x.dtype)
    q = linear(p["q_proj"], x[:, :1])
    k = linear(p["k_proj"], x)
    val = linear(p["v_proj"], x)
    nh = v.heads
    hd = c // nh
    q = q.reshape(b, 1, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
    val = val.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q * (hd**-0.5), k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    pooled = (
        jnp.einsum("bhqk,bhkd->bhqd", weights, val)
        .transpose(0, 2, 1, 3)
        .reshape(b, 1, c)
    )
    return linear(p["c_proj"], pooled)[:, 0]


def _encode_image_resnet(
    params: Params, v: CLIPResNetVisionConfig, images: jnp.ndarray
) -> jnp.ndarray:
    p = params["visual"]
    x = images
    x = jax.nn.relu(
        _batch_norm(p["stem"]["bn1"], _conv2d(p["stem"]["conv1"]["w"], x, 2, 1))
    )
    x = jax.nn.relu(
        _batch_norm(p["stem"]["bn2"], _conv2d(p["stem"]["conv2"]["w"], x, 1, 1))
    )
    x = jax.nn.relu(
        _batch_norm(p["stem"]["bn3"], _conv2d(p["stem"]["conv3"]["w"], x, 1, 1))
    )
    x = _avg_pool(x, 2)
    for stage in range(4):
        for block, bp in enumerate(p[f"layer{stage + 1}"]):
            x = _bottleneck(bp, x, stride=2 if (stage > 0 and block == 0) else 1)
    return _attention_pool(p["attnpool"], v, x)


def encode_image(
    params: Params, cfg: CLIPConfig, images: jnp.ndarray
) -> jnp.ndarray:
    """images: (B, H, W, 3) normalized NHWC -> (B, output_dim).

    (reference clip_official.py:200-209 -> CLIP VisionTransformer, or
    ModifiedResNet for the RN* names)"""
    v = cfg.vision
    if isinstance(v, CLIPResNetVisionConfig):
        return _encode_image_resnet(params, v, images)
    x = jax.lax.conv_general_dilated(
        images,
        params["visual"]["conv1"]["w"].astype(images.dtype),
        window_strides=(v.patch_size, v.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(images.dtype)
    b, gh, gw, w = x.shape
    x = x.reshape(b, gh * gw, w)
    cls = jnp.broadcast_to(
        params["visual"]["class_embedding"].astype(x.dtype), (b, 1, w)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["visual"]["positional_embedding"].astype(x.dtype)
    x = layer_norm(params["visual"]["ln_pre"], x)
    for block in params["visual"]["blocks"]:
        x = _resblock(block, x, v.heads, False)
    x = layer_norm(params["visual"]["ln_post"], x[:, 0])
    return (x @ params["visual"]["proj"].astype(x.dtype))


def _text_transformer(
    params: Params, cfg: CLIPConfig, x: jnp.ndarray
) -> jnp.ndarray:
    for block in params["text"]["blocks"]:
        x = _resblock(block, x, cfg.text.heads, True)
    return x


def encode_text(
    params: Params,
    cfg: CLIPConfig,
    text: jnp.ndarray,  # (B, 77) int token ids (reduced ids in reduced mode)
    eot_positions: Optional[jnp.ndarray] = None,  # (B,) index of EOT token
) -> jnp.ndarray:
    """(reference clip_official.py:211-218 -> CLIP.encode_text)

    The reference locates EOT via ``text.argmax(-1)``, which silently breaks
    under the reduced vocabulary (EOT is no longer the max id). Here the EOT
    position is passed explicitly (datasets emit it); ``argmax`` is the
    fallback for full-vocab ids.
    """
    emb = params["text"]["token_embedding"][text]
    x = emb + params["text"]["positional_embedding"].astype(emb.dtype)
    x = _text_transformer(params, cfg, x)
    x = layer_norm(params["text"]["ln_final"], x)
    if eot_positions is None:
        eot_positions = jnp.argmax(text, axis=-1)
    pooled = jnp.take_along_axis(
        x, eot_positions[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    return pooled @ params["text"]["text_projection"].astype(pooled.dtype)


def encode_keywords(
    params: Params,
    cfg: CLIPConfig,
    keywords: jnp.ndarray,  # (B, K, text_width) keyword embeddings
    sot_id: int,
    eot_id: int,
) -> jnp.ndarray:
    """Inject K keyword embeddings into a SOT/EOT buffer and run the text
    tower; pool at position K+1 (EOT) (reference clip_official.py:220-264).

    The reference pads the buffer to the full 77-token context. Under the
    tower's CAUSAL attention, the output at the EOT position (K+1) depends
    only on positions 0..K+1 — the 77-K-2 trailing pad positions are pure
    waste (they attend backward, nothing reads them). Running the tower at
    sequence length K+2 is therefore mathematically EXACT and ~7x less
    text-tower work at K=8 (train-step impact measured in
    docs/DESIGN_NOTES.md round-2 budget). Exactness is pinned against the
    full-77-buffer encode_text in tests (tiny and production dims)."""
    b, k, w = keywords.shape
    emb_table = params["text"]["token_embedding"]
    sot_emb = emb_table[sot_id].astype(keywords.dtype)
    eot_emb = emb_table[eot_id].astype(keywords.dtype)
    x = jnp.concatenate(
        [
            jnp.broadcast_to(sot_emb, (b, 1, w)),
            keywords,
            jnp.broadcast_to(eot_emb, (b, 1, w)),
        ],
        axis=1,
    )  # (B, K+2, W)
    x = x + params["text"]["positional_embedding"][: k + 2].astype(x.dtype)
    x = _text_transformer(params, cfg, x)
    x = layer_norm(params["text"]["ln_final"], x)
    pooled = x[:, k + 1]
    return pooled @ params["text"]["text_projection"].astype(pooled.dtype)


def get_scores(
    params: Params,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    text: jnp.ndarray,
    eot_positions: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """logit_scale-scaled cosine scores (reference clip_official.py:279-289)."""
    img = encode_image(params, cfg, images)
    txt = encode_text(params, cfg, text, eot_positions)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T


# ---------------------------------------------------------------------------
# reduced vocabulary (reference clip_official.py:61-106)
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class ReducedVocab:
    selected_ids: np.ndarray  # (V_red,) original token ids
    original_to_reduced: dict
    reduced_to_original: dict
    freq_dist: np.ndarray  # (V_red,) normalized frequencies

    @property
    def size(self) -> int:
        return len(self.selected_ids)

    def map_original(self, ids: np.ndarray) -> np.ndarray:
        """Vectorized original->reduced id mapping (host side). The LUT is
        built once and cached — this sits on the serving text-request path
        (clip_api tokenization), where rebuilding a ~49k-slot table per
        call was pure repeated work."""
        lut = getattr(self, "_lut", None)
        if lut is None:
            lut = np.full(int(self.selected_ids.max()) + 1, -1, np.int64)
            lut[self.selected_ids] = np.arange(len(self.selected_ids))
            object.__setattr__(self, "_lut", lut)
        mapped = lut[ids]
        if (mapped < 0).any():
            raise KeyError("token id outside the reduced vocabulary")
        return mapped

    def map_reduced(self, ids: np.ndarray) -> np.ndarray:
        return self.selected_ids[ids]


def load_reduced_vocab(npy_path: str) -> ReducedVocab:
    data = np.load(npy_path)
    selected = data[:, 0].astype(np.int64)
    freq = data[:, 1].astype(np.float64)
    return ReducedVocab(
        selected_ids=selected,
        original_to_reduced={int(o): i for i, o in enumerate(selected)},
        reduced_to_original={i: int(o) for i, o in enumerate(selected)},
        freq_dist=freq / freq.sum(),
    )


def reduce_token_embedding(params: Params, vocab: ReducedVocab) -> Params:
    """Swap the text token-embedding table for the reduced one.

    Deliberate deviation: the reference keeps the FULL 49408-row table
    alive as ``original_text_emb_weight`` (clip_official.py:81) — a
    registered parameter that nothing ever reads but that bloats every
    Lightning checkpoint and DP replica by ~100-155 MB. Detokenization
    diagnostics here use the host-side ``ReducedVocab`` maps, so the full
    table is simply dropped after slicing (it survives in the pretrained
    assets if ever needed)."""
    new_text = dict(params["text"])
    new_text["token_embedding"] = params["text"]["token_embedding"][
        jnp.asarray(vocab.selected_ids)
    ]
    out = dict(params)
    out["text"] = new_text
    return out
