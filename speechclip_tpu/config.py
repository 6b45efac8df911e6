"""Hierarchical run configuration.

Equivalent capability to the reference's ``OrderedNamespace``
(/root/reference/avssl/base/ordered_namespace.py:7-153): an attribute/dict
hybrid tree assembled from YAML files plus CLI overrides, picklable so it can
ride inside checkpoints. The design here is a thin dict subclass rather than a
Namespace wrapper: it stays a plain mapping (serializes to JSON/YAML/msgpack
trivially, works as an orbax metadata payload) while still supporting
``cfg.model_settings.cascaded_branch.keyword.number`` access.
"""

from __future__ import annotations

import copy
import json
from typing import Any, Iterable, Mapping

import yaml

_MISSING = object()


class ConfigNode(dict):
    """A dict with attribute access, recursive wrapping and deep merge."""

    def __init__(self, *sources: Any, **kwargs: Any):
        super().__init__()
        for src in sources:
            if src is None:
                continue
            self.merge_(src)
        if kwargs:
            self.merge_(kwargs)

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, _wrap(value))

    def update(self, *args, **kwargs) -> None:  # type: ignore[override]
        # dict.update would bypass _wrap and plant raw dicts in the tree;
        # honor the keys()-protocol like dict.update does
        for src in args:
            if hasattr(src, "keys"):
                for k in src.keys():
                    self[k] = src[k]
            else:
                for k, v in src:
                    self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def setdefault(self, key: str, default: Any = None) -> Any:
        if key not in self:
            self[key] = default  # goes through __setitem__ -> _wrap
        return self[key]

    def __ior__(self, other):  # cfg |= {...} must wrap too
        self.update(other)
        return self

    # -- merging -------------------------------------------------------------
    def merge_(self, other: Any) -> "ConfigNode":
        """Deep-merge ``other`` into self (in place). Later wins.

        Mappings merge recursively; any other value (including lists)
        replaces wholesale.
        """
        if hasattr(other, "__dict__") and not isinstance(other, Mapping):
            other = vars(other)  # argparse.Namespace and friends
        if not isinstance(other, Mapping):
            raise TypeError(f"cannot merge {type(other)!r} into ConfigNode")
        for k, v in other.items():
            if (
                k in self
                and isinstance(self[k], ConfigNode)
                and isinstance(v, Mapping)
            ):
                self[k].merge_(v)
            else:
                self[k] = v
        return self

    def merged(self, other: Any) -> "ConfigNode":
        out = copy.deepcopy(self)
        out.merge_(other)
        return out

    # -- lookups ------------------------------------------------------------
    def get_path(self, dotted: str, default: Any = None) -> Any:
        """cfg.get_path("model_settings.cascaded_branch.type")."""
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, Mapping) and part in node:
                node = node[part]
            else:
                return default
        return node

    def set_path(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], ConfigNode):
                node[part] = ConfigNode()
            node = node[part]
        node[parts[-1]] = value

    # -- serialization ------------------------------------------------------
    def to_dict(self) -> dict:
        return {
            k: v.to_dict() if isinstance(v, ConfigNode) else copy.deepcopy(v)
            for k, v in self.items()
        }

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    def __deepcopy__(self, memo: dict) -> "ConfigNode":
        return ConfigNode(
            {k: copy.deepcopy(v, memo) for k, v in self.items()}
        )

    # dict already pickles; __reduce__ keeps the subclass through pickle.
    def __reduce__(self):
        return (_rebuild, (self.to_dict(),))


def _rebuild(d: dict) -> ConfigNode:
    return ConfigNode(d)


def _wrap(value: Any) -> Any:
    if isinstance(value, ConfigNode):
        # assignment takes a SNAPSHOT: storing the node by reference made
        # ConfigNode(base) share nested subtrees with base, so a later
        # in-place merge_ into the copy silently rewrote base's
        # hyperparameters (and vice versa)
        return copy.deepcopy(value)
    if isinstance(value, Mapping):
        node = ConfigNode()
        for k, v in value.items():
            node[k] = v
        return node
    if isinstance(value, (list, tuple)):
        return [
            _wrap(v) if isinstance(v, Mapping) else v for v in value
        ]
    return value


def _parse_override_value(text: str) -> Any:
    """Parse a CLI override value with YAML scalar semantics."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def load_config(
    path: str | None = None,
    overrides: Iterable[str] = (),
    base: Mapping | None = None,
) -> ConfigNode:
    """Build a config from a YAML file plus ``a.b.c=value`` CLI overrides."""
    cfg = ConfigNode(base) if base is not None else ConfigNode()
    if path is not None:
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        cfg.merge_(loaded)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} must look like key.path=value")
        key, _, value = item.partition("=")
        cfg.set_path(key.strip(), _parse_override_value(value.strip()))
    return cfg


def flagship_config() -> ConfigNode:
    """The flagship preset: SpeechCLIP base (HuBERT-base + CLIP ViT-B/32,
    parallel + cascaded branches, random init — no downloaded assets).

    Mirrors config/speechCLIP/model_base/spchclp_c.yaml's topology with both
    objective weights live; used by the driver hooks, the bench scripts, and
    ``example.py``'s no-checkpoint demo path.
    """
    return ConfigNode(
        {
            "model_settings": {
                "cascaded_objective_weight": 1.0,
                "parallel_objective_weight": 1.0,
                "parallel_branch": {
                    "transformer_type": "TransformerEncoder",
                    "transformer_args": {
                        "n_layers": 1,
                        "d_model": 768,
                        "nhead": 8,
                        "dim_feedforward": 3072,
                        "dropout": 0.1,
                        "activation": "gelu",
                        "layer_norm_eps": 1e-5,
                        "batch_first": True,
                        "norm_first": False,
                    },
                    "need_projection": True,
                },
                "cascaded_branch": {
                    "type": "KW_CascadedBranch",
                    "transformer_type": "MultiheadAttentionAndNorm",
                    "transformer_args": {
                        "n_layers": 1,
                        "d_model": 768,
                        "nhead": 1,
                        "dim_feedforward": 3072,
                        "dropout": 0.1,
                    },
                    "keyword": {
                        "number": 8,
                        "batchnorms": {
                            "type": "eachKw",
                            "std_scale": 1.0,
                            "learnable": True,
                            "parallel": True,
                        },
                    },
                    "vq": {
                        "type": "SimpleVectorQuantizer",
                        "args": {
                            "temp": "fixed=0.1",
                            "time_first": True,
                            "use_gumbel": False,
                            "hard": True,
                        },
                    },
                },
            },
            "cl_loss": {
                "type": "MaskedContrastiveLoss",
                "args": {"temperature": 0.07, "temperature_trainable": False},
            },
            "retrieval": {"audio_feat_src": "parallel", "recall_at": [1, 5, 10]},
            "clip": {
                "name": "ViT-B/32",
                "image_encoder_trainable": False,
                "text_encoder_trainable": False,
            },
            "audio_encoder": {
                "type": "FairseqHubert",
                "name": "hubert",
                "pretrained": False,
                "trainable": False,
                "feat_select_idx": "weighted_sum",
                "layer_drop": 0.0,
                "max_audio_len": 102400,
                "normalize_hiddenstates": False,
                "optim": {"name": "Adam", "args": {"lr": 1e-4, "weight_decay": 1e-6}},
                "scheduler": {
                    "name": "linear_warmup_decay",
                    "warmup": 5000,
                    "max_step": 50000,
                    "final_lr": 1e-8,
                },
            },
            "trainer": {"precision": 16, "gradient_clip_val": 4},
        }
    )


def flagship_large_config() -> ConfigNode:
    """The large preset: HuBERT-large (ll60k) + CLIP ViT-L/14, both
    branches, random init — the dims of the reference's 4-GPU configs
    (config/speechCLIP/model_large/*; README.md:34). The base→large diffs
    mirror the shipped YAML diffs exactly (SURVEY.md §5): d_model 768→1024,
    ffn 3072→4096, ViT-B/32→ViT-L/14, hubert→hubert_large_ll60k,
    temperature_trainable false→true, normalize_hiddenstates false→true.
    Used by the large bench paths (bench.py extras,
    scripts/bench_train_budget.py, scripts/bench_variants.py)."""
    cfg = flagship_config()
    cfg.audio_encoder.name = "hubert_large_ll60k"
    cfg.audio_encoder.normalize_hiddenstates = True
    cfg.audio_encoder.normalize_type = "s3prl"
    cfg.clip.name = "ViT-L/14"
    cfg.cl_loss.args.temperature_trainable = True
    for b in ("parallel_branch", "cascaded_branch"):
        cfg.model_settings[b].transformer_args.d_model = 1024
        cfg.model_settings[b].transformer_args.dim_feedforward = 4096
    return cfg


def bench_variant_config(variant: str) -> ConfigNode:
    """The bench scripts' shared variant -> config switch:
    ``{base,large}[_par|_casc]``. Prefix picks the preset (flagship base
    or large); the suffix gates to one live branch (_par zeroes the
    cascaded objective, _casc the parallel one). Four scripts once
    carried their own copies of this switch and drifted (bench_variants
    lost the large normalize_hiddenstates flag at one point)."""
    prefix = variant.split("_")[0]
    if prefix == "base":
        cfg = flagship_config()
    elif prefix == "large":
        cfg = flagship_large_config()
    else:
        raise ValueError(f"unknown bench variant {variant!r}")
    if variant.endswith("_par"):
        cfg.model_settings.cascaded_objective_weight = 0.0
    elif variant.endswith("_casc"):
        cfg.model_settings.parallel_objective_weight = 0.0
    return cfg


def flagship_tiny_config() -> ConfigNode:
    """``flagship_config()`` shrunk to tiny tower dims with the SAME
    topology (both branches, kw-BN, VQ, weighted sum, reduced-vocab-free).

    The shape every full-graph-but-small-constants consumer shares: the
    driver's multi-chip dryrun, the TPU export/serving drives (StableHLO
    bakes weights in as constants and the remote-compile relay stalls on
    multi-hundred-MB graphs), and the serving bench.
    """
    cfg = flagship_config()
    cfg.audio_encoder.custom = ConfigNode(
        {
            "conv_layers": [[16, 10, 5], [16, 3, 2], [16, 3, 2]],
            "encoder_embed_dim": 32,
            "encoder_layers": 2,
            "encoder_ffn_dim": 64,
            "encoder_heads": 4,
            "downsample_rate": 20,
        }
    )
    cfg.clip.custom = ConfigNode(
        {
            "vision": {
                "image_size": 32,
                "patch_size": 8,
                "width": 32,
                "layers": 2,
                "heads": 4,
                "output_dim": 16,
            },
            "text": {
                "vocab_size": 64,
                "width": 32,
                "layers": 2,
                "heads": 4,
                "output_dim": 16,
            },
        }
    )
    for branch in ("parallel_branch", "cascaded_branch"):
        cfg.model_settings[branch].transformer_args.d_model = 32
        cfg.model_settings[branch].transformer_args.dim_feedforward = 64
    cfg.model_settings.parallel_branch.transformer_args.nhead = 4
    cfg.model_settings.cascaded_branch.keyword.number = 4
    return cfg
