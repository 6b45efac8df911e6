"""Torch-checkpoint -> JAX-param converters.

The parity anchors of the rebuild (SURVEY.md §7 step 2): load the exact
pretrained weights the reference uses —

- HuBERT from a fairseq checkpoint (the reference downloads
  hubert_base_ls960.pt / hubert_large_ll60k.pt,
  avssl/module/speech_encoder_plus.py:327-331) or from a HuggingFace
  ``HubertModel`` state dict (same architecture, different names);
- CLIP from an OpenAI ``clip.load`` state dict (reference
  avssl/module/clip_official.py:50) or a HuggingFace ``CLIPModel``;
- a full reference Lightning checkpoint (KWClip_GeneralTransformer
  ``state_dict`` + pickled config), mapping every branch/projection/loss
  parameter into our pytree so released checkpoints reproduce bit-similar
  retrieval scores.

Conventions: our linears are ``y = x @ w + b`` (torch weights transpose);
convs are WIO / HWIO; weight-norm on HuBERT's pos_conv is folded into a
plain conv weight (the tower's reparameterization only matters for training
dynamics of a module every shipped config freezes).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

import jax.numpy as jnp

from ..models.hubert import HubertConfig
from ..models.clip import CLIPConfig

Array = np.ndarray


def _t(x) -> Array:
    arr = np.asarray(x, dtype=np.float32)
    return arr


def _lin(sd: Mapping, prefix: str) -> Dict:
    w = _t(sd[f"{prefix}.weight"]).T
    b = sd.get(f"{prefix}.bias")
    return {"w": jnp.asarray(w), "b": jnp.asarray(_t(b)) if b is not None else None}


def _ln(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": jnp.asarray(_t(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_t(sd[f"{prefix}.bias"])),
    }


def _mha_from_qkv(sd: Mapping, prefix: str) -> Dict:
    """Separate q/k/v/out projections (fairseq & HF style) -> fused in_proj."""
    names = {"q": "q_proj", "k": "k_proj", "v": "v_proj"}
    ws, bs = [], []
    for key in ("q", "k", "v"):
        ws.append(_t(sd[f"{prefix}.{names[key]}.weight"]).T)
        bs.append(_t(sd[f"{prefix}.{names[key]}.bias"]))
    return {
        "in_proj": {
            "w": jnp.asarray(np.concatenate(ws, axis=1)),
            "b": jnp.asarray(np.concatenate(bs)),
        },
        "out_proj": _lin(sd, f"{prefix}.out_proj"),
    }


def _mha_from_in_proj(sd: Mapping, prefix: str) -> Dict:
    """torch nn.MultiheadAttention in_proj_weight style (OpenAI CLIP,
    branch transformers)."""
    return {
        "in_proj": {
            "w": jnp.asarray(_t(sd[f"{prefix}.in_proj_weight"]).T),
            "b": jnp.asarray(_t(sd[f"{prefix}.in_proj_bias"])),
        },
        "out_proj": _lin(sd, f"{prefix}.out_proj"),
    }


def _fold_weight_norm(v: Array, g: Array) -> Array:
    """weight_norm(dim=2) fold: w[o,i,k] = g[k] * v[o,i,k] / ||v[:,:,k]||."""
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=(0, 1), keepdims=True))
    return (g.reshape(1, 1, -1) * v / np.maximum(norm, 1e-12)).astype(np.float32)


def _pos_conv(sd: Mapping, prefix: str) -> Dict:
    """Handles fairseq `weight_g/weight_v`, torch>=2.1 parametrizations, and
    plain `weight`."""
    if f"{prefix}.weight_v" in sd:
        v = _t(sd[f"{prefix}.weight_v"])
        g = _t(sd[f"{prefix}.weight_g"])
        w = _fold_weight_norm(v, g.reshape(-1))
    elif f"{prefix}.parametrizations.weight.original1" in sd:
        v = _t(sd[f"{prefix}.parametrizations.weight.original1"])
        g = _t(sd[f"{prefix}.parametrizations.weight.original0"])
        w = _fold_weight_norm(v, g.reshape(-1))
    else:
        w = _t(sd[f"{prefix}.weight"])
    # torch conv1d (out, in/groups, k) -> WIO (k, in/groups, out)
    w = w.transpose(2, 1, 0)
    b = _t(sd[f"{prefix}.bias"])
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


# ---------------------------------------------------------------------------
# HuBERT
# ---------------------------------------------------------------------------
def hubert_from_fairseq(sd: Mapping, cfg: HubertConfig) -> Dict:
    """fairseq HubertModel state dict (possibly under a key prefix)."""
    convs = []
    for i in range(len(cfg.conv_layers)):
        layer: Dict = {
            "w": jnp.asarray(
                _t(sd[f"feature_extractor.conv_layers.{i}.0.weight"]).transpose(2, 1, 0)
            )
        }
        b = sd.get(f"feature_extractor.conv_layers.{i}.0.bias")
        layer["b"] = jnp.asarray(_t(b)) if b is not None else None
        if cfg.extractor_mode == "default" and i == 0:
            layer["norm"] = _ln(sd, f"feature_extractor.conv_layers.{i}.2")
        elif cfg.extractor_mode == "layer_norm":
            layer["norm"] = _ln(sd, f"feature_extractor.conv_layers.{i}.2.1")
        convs.append(layer)

    layers = []
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        layers.append(
            {
                "self_attn": _mha_from_qkv(sd, f"{p}.self_attn"),
                "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
                "fc1": _lin(sd, f"{p}.fc1"),
                "fc2": _lin(sd, f"{p}.fc2"),
                "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
            }
        )

    return {
        "feature_extractor": convs,
        "layer_norm": _ln(sd, "layer_norm"),
        "post_extract_proj": (
            _lin(sd, "post_extract_proj")
            if "post_extract_proj.weight" in sd
            else None
        ),
        "encoder": {
            "pos_conv": _pos_conv(sd, "encoder.pos_conv.0"),
            "layer_norm": _ln(sd, "encoder.layer_norm"),
            "layers": layers,
        },
    }


def hubert_from_hf(sd: Mapping, cfg: HubertConfig) -> Dict:
    """HuggingFace transformers HubertModel state dict."""
    convs = []
    for i in range(len(cfg.conv_layers)):
        layer: Dict = {
            "w": jnp.asarray(
                _t(sd[f"feature_extractor.conv_layers.{i}.conv.weight"]).transpose(
                    2, 1, 0
                )
            )
        }
        b = sd.get(f"feature_extractor.conv_layers.{i}.conv.bias")
        layer["b"] = jnp.asarray(_t(b)) if b is not None else None
        norm_key = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if norm_key in sd:
            layer["norm"] = _ln(sd, f"feature_extractor.conv_layers.{i}.layer_norm")
        convs.append(layer)

    layers = []
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        layers.append(
            {
                "self_attn": _mha_from_qkv(sd, f"{p}.attention"),
                "self_attn_layer_norm": _ln(sd, f"{p}.layer_norm"),
                "fc1": _lin(sd, f"{p}.feed_forward.intermediate_dense"),
                "fc2": _lin(sd, f"{p}.feed_forward.output_dense"),
                "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
            }
        )

    return {
        "feature_extractor": convs,
        "layer_norm": _ln(sd, "feature_projection.layer_norm"),
        "post_extract_proj": (
            _lin(sd, "feature_projection.projection")
            if "feature_projection.projection.weight" in sd
            else None
        ),
        "encoder": {
            "pos_conv": _pos_conv(sd, "encoder.pos_conv_embed.conv"),
            "layer_norm": _ln(sd, "encoder.layer_norm"),
            "layers": layers,
        },
    }


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------
def _openai_block(sd: Mapping, prefix: str) -> Dict:
    return {
        "attn": _mha_from_in_proj(sd, f"{prefix}.attn"),
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "mlp": {
            "c_fc": _lin(sd, f"{prefix}.mlp.c_fc"),
            "c_proj": _lin(sd, f"{prefix}.mlp.c_proj"),
        },
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
    }


def _bn2d(sd: Mapping, prefix: str) -> Dict:
    """torch BatchNorm2d -> inference-stat params (models/clip._batch_norm)."""
    return {
        "scale": jnp.asarray(_t(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_t(sd[f"{prefix}.bias"])),
        "mean": jnp.asarray(_t(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(_t(sd[f"{prefix}.running_var"])),
    }


def _conv2d_w(sd: Mapping, key: str) -> Dict:
    """torch Conv2d weight (O, I, kH, kW) -> HWIO."""
    return {"w": jnp.asarray(_t(sd[key]).transpose(2, 3, 1, 0))}


def _resnet_visual_from_openai(sd: Mapping, cfg: CLIPConfig) -> Dict:
    """ModifiedResNet visual tower (RN* names): 3-conv stem, four bottleneck
    stages (downsample Sequential keys .0=conv/.1=bn; the .-1 avgpool is
    parameter-free), AttentionPool2d with separate q/k/v/c projections."""
    visual: Dict = {
        "stem": {
            "conv1": _conv2d_w(sd, "visual.conv1.weight"),
            "bn1": _bn2d(sd, "visual.bn1"),
            "conv2": _conv2d_w(sd, "visual.conv2.weight"),
            "bn2": _bn2d(sd, "visual.bn2"),
            "conv3": _conv2d_w(sd, "visual.conv3.weight"),
            "bn3": _bn2d(sd, "visual.bn3"),
        }
    }
    for stage in range(4):
        blocks = []
        for i in range(cfg.vision.layers[stage]):
            prefix = f"visual.layer{stage + 1}.{i}"
            p = {
                "conv1": _conv2d_w(sd, f"{prefix}.conv1.weight"),
                "bn1": _bn2d(sd, f"{prefix}.bn1"),
                "conv2": _conv2d_w(sd, f"{prefix}.conv2.weight"),
                "bn2": _bn2d(sd, f"{prefix}.bn2"),
                "conv3": _conv2d_w(sd, f"{prefix}.conv3.weight"),
                "bn3": _bn2d(sd, f"{prefix}.bn3"),
            }
            if f"{prefix}.downsample.0.weight" in sd:
                p["downsample"] = {
                    "conv": _conv2d_w(sd, f"{prefix}.downsample.0.weight"),
                    "bn": _bn2d(sd, f"{prefix}.downsample.1"),
                }
            blocks.append(p)
        visual[f"layer{stage + 1}"] = blocks
    visual["attnpool"] = {
        "positional_embedding": jnp.asarray(
            _t(sd["visual.attnpool.positional_embedding"])
        ),
        "q_proj": _lin(sd, "visual.attnpool.q_proj"),
        "k_proj": _lin(sd, "visual.attnpool.k_proj"),
        "v_proj": _lin(sd, "visual.attnpool.v_proj"),
        "c_proj": _lin(sd, "visual.attnpool.c_proj"),
    }
    return visual


def clip_from_openai(sd: Mapping, cfg: CLIPConfig) -> Dict:
    """OpenAI CLIP state dict (ViT or ModifiedResNet visual tower)."""
    if "visual.attnpool.positional_embedding" in sd:
        return {
            "visual": _resnet_visual_from_openai(sd, cfg),
            "text": _openai_text(sd, cfg),
            "logit_scale": jnp.asarray(_t(sd["logit_scale"])),
        }
    visual = {
        "conv1": {
            # torch conv2d (out, in, kh, kw) -> HWIO
            "w": jnp.asarray(_t(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0))
        },
        "class_embedding": jnp.asarray(_t(sd["visual.class_embedding"])),
        "positional_embedding": jnp.asarray(_t(sd["visual.positional_embedding"])),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": [
            _openai_block(sd, f"visual.transformer.resblocks.{i}")
            for i in range(cfg.vision.layers)
        ],
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": jnp.asarray(_t(sd["visual.proj"])),  # already (width, out)
    }
    return {
        "visual": visual,
        "text": _openai_text(sd, cfg),
        "logit_scale": jnp.asarray(_t(sd["logit_scale"])),
    }


def _openai_text(sd: Mapping, cfg: CLIPConfig) -> Dict:
    return {
        "token_embedding": jnp.asarray(_t(sd["token_embedding.weight"])),
        "positional_embedding": jnp.asarray(_t(sd["positional_embedding"])),
        "blocks": [
            _openai_block(sd, f"transformer.resblocks.{i}")
            for i in range(cfg.text.layers)
        ],
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": jnp.asarray(_t(sd["text_projection"])),
    }


def load_hubert_checkpoint(path: str, cfg: HubertConfig) -> Dict:
    """Load a HuBERT checkpoint file: fairseq .pt ({"model": sd, "cfg": ...},
    the files the reference downloads, speech_encoder_plus.py:327-331) or a
    HF transformers state dict; format detected by key names."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else v for k, v in sd.items()}
    if any(k.startswith("feature_extractor.conv_layers.0.0.") for k in sd):
        return hubert_from_fairseq(sd, cfg)
    if any(k.startswith("feature_extractor.conv_layers.0.conv.") for k in sd):
        return hubert_from_hf(sd, cfg)
    # HF full-model dumps prefix with "hubert."
    stripped = {k[len("hubert."):]: v for k, v in sd.items() if k.startswith("hubert.")}
    if stripped:
        return hubert_from_hf(stripped, cfg)
    raise ValueError(f"unrecognized HuBERT state dict format in {path}")


def load_clip_checkpoint(path: str, cfg: CLIPConfig) -> Dict:
    """Load a CLIP checkpoint: OpenAI TorchScript .pt (what clip.load
    fetches, reference clip_official.py:50) or an HF CLIPModel state dict."""
    import torch

    try:
        jit_model = torch.jit.load(path, map_location="cpu")
        sd = {k: v for k, v in jit_model.state_dict().items()}
    except RuntimeError:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.detach().float().numpy() if hasattr(v, "detach") else v for k, v in sd.items()}
    if "visual.conv1.weight" in sd:
        return clip_from_openai(sd, cfg)
    if "vision_model.embeddings.patch_embedding.weight" in sd:
        return clip_from_hf(sd, cfg)
    raise ValueError(f"unrecognized CLIP state dict format in {path}")


def _hf_clip_block(sd: Mapping, prefix: str) -> Dict:
    return {
        "attn": _mha_from_qkv(sd, f"{prefix}.self_attn"),
        "ln_1": _ln(sd, f"{prefix}.layer_norm1"),
        "mlp": {
            "c_fc": _lin(sd, f"{prefix}.mlp.fc1"),
            "c_proj": _lin(sd, f"{prefix}.mlp.fc2"),
        },
        "ln_2": _ln(sd, f"{prefix}.layer_norm2"),
    }


def clip_from_hf(sd: Mapping, cfg: CLIPConfig) -> Dict:
    """HuggingFace transformers CLIPModel state dict."""
    pre_ln = (
        "vision_model.pre_layrnorm"
        if "vision_model.pre_layrnorm.weight" in sd
        else "vision_model.pre_layernorm"
    )
    visual = {
        "conv1": {
            "w": jnp.asarray(
                _t(sd["vision_model.embeddings.patch_embedding.weight"]).transpose(
                    2, 3, 1, 0
                )
            )
        },
        "class_embedding": jnp.asarray(
            _t(sd["vision_model.embeddings.class_embedding"]).reshape(-1)
        ),
        "positional_embedding": jnp.asarray(
            _t(sd["vision_model.embeddings.position_embedding.weight"])
        ),
        "ln_pre": _ln(sd, pre_ln),
        "blocks": [
            _hf_clip_block(sd, f"vision_model.encoder.layers.{i}")
            for i in range(cfg.vision.layers)
        ],
        "ln_post": _ln(sd, "vision_model.post_layernorm"),
        "proj": jnp.asarray(_t(sd["visual_projection.weight"]).T),
    }
    text = {
        "token_embedding": jnp.asarray(
            _t(sd["text_model.embeddings.token_embedding.weight"])
        ),
        "positional_embedding": jnp.asarray(
            _t(sd["text_model.embeddings.position_embedding.weight"])
        ),
        "blocks": [
            _hf_clip_block(sd, f"text_model.encoder.layers.{i}")
            for i in range(cfg.text.layers)
        ],
        "ln_final": _ln(sd, "text_model.final_layer_norm"),
        "text_projection": jnp.asarray(_t(sd["text_projection.weight"]).T),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(_t(sd["logit_scale"])),
    }
