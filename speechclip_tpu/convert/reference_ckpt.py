"""Reference (PyTorch-Lightning) checkpoint -> speechclip_tpu params.

The reference persists everything in one Lightning checkpoint: full
state_dict (incl. frozen HuBERT + CLIP weights) plus the pickled config under
``hyper_parameters`` (avssl/model/base_model.py:14, base_task.py:60-77).
This module maps that naming contract into our pytrees so the six released
checkpoints (download_ckpts.sh) reproduce the published retrieval numbers.

State-dict prefixes handled (names per the reference module tree):
  audio_encoder.encoder.*            fairseq HubertModel
  audio_encoder.weightedsum_layer.*  WeightedSumLayer
  clip.model.*                       OpenAI CLIP (token_embedding possibly
                                     already reduced, clip_official.py:86)
  criterion.temperature              trainable log(1/t) scalar
  cascaded_branch.{cls,self_att,linear_proj,vector_quantizer,bn_layer}.*
  parallel_branch.{cls,self_att,linear_proj}.*
  {img_enc_proj_net,p_branch_proj_net,c_branch_proj_net}.sequential.*
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax.numpy as jnp

from ..config import ConfigNode
from .from_torch import (
    _ln,
    _lin,
    _mha_from_in_proj,
    _t,
    clip_from_openai,
    hubert_from_fairseq,
)


def _sub_dict(sd: Mapping, prefix: str) -> Dict:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


# --------------------------------------------------------------- unpickling
# A RELEASED checkpoint's hyper_parameters pickle references classes from
# packages that are not (and must not be) runtime dependencies here:
# pytorch_lightning.utilities.parsing.AttributeDict wraps the config, and
# the config itself is an avssl OrderedNamespace tree
# (avssl/base/ordered_namespace.py:7-63 — state is an `_odict` OrderedDict
# whose values are nested OrderedNamespace instances). A plain torch.load
# would die with ModuleNotFoundError; the tolerant unpickler below resolves
# unimportable classes to generated dict-subclass stubs (pickle's protocol-2
# reconstruction fills either the stub's dict items or its __dict__), and
# _as_plain_config() flattens the result back to nested plain dicts.

_STUB_CLASSES: Dict = {}


def _stub_class(module: str, name: str):
    key = (module, name)
    if key not in _STUB_CLASSES:
        _STUB_CLASSES[key] = type(
            name, (dict,), {"__module__": module, "_ckpt_stub": True}
        )
    return _STUB_CLASSES[key]


def _tolerant_pickle_module():
    import pickle
    import types

    class TolerantUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return _stub_class(module, name)

    # a real ModuleType: torch.load inspects pickle_module.__name__
    mod = types.ModuleType("speechclip_tpu_tolerant_pickle")
    mod.Unpickler = TolerantUnpickler
    mod.load = lambda f, **kw: TolerantUnpickler(f, **kw).load()
    mod.loads = pickle.loads
    mod.dumps = pickle.dumps
    mod.HIGHEST_PROTOCOL = pickle.HIGHEST_PROTOCOL
    return mod


def _as_plain_config(obj):
    """Recursively flatten the unpickled reference config to plain dicts.

    Handles: OrderedNamespace(-stub) trees (the data lives in
    ``__dict__['_odict']``, NOT in the mapping surface — the pre-round-5
    ``cfg_obj.__dict__`` extraction produced ``{'_odict': ...}`` and every
    nested get_path lookup silently fell back to its default), Lightning
    AttributeDict (a dict subclass), argparse/SimpleNamespace, lists."""
    state = getattr(obj, "__dict__", None)
    if isinstance(state, dict) and "_odict" in state:
        obj = state["_odict"]
    if isinstance(obj, Mapping):
        return {k: _as_plain_config(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_as_plain_config(v) for v in obj]
    if state and type(obj).__module__ in ("argparse", "types"):
        return {k: _as_plain_config(v) for k, v in vars(obj).items()}
    return obj


def _branch_transformer(sd: Mapping, transformer_type: str, n_layers: int) -> Dict:
    if transformer_type == "MultiheadAttentionAndNorm":
        return {
            "attn": _mha_from_in_proj(sd, "multihead_attn_layer"),
            "norm": _ln(sd, "attentionBlock_Norm"),
        }
    if transformer_type == "TransformerEncoder":
        layers = []
        for i in range(n_layers):
            p = f"model.layers.{i}"
            layers.append(
                {
                    "self_attn": _mha_from_in_proj(sd, f"{p}.self_attn"),
                    "linear1": _lin(sd, f"{p}.linear1"),
                    "linear2": _lin(sd, f"{p}.linear2"),
                    "norm1": _ln(sd, f"{p}.norm1"),
                    "norm2": _ln(sd, f"{p}.norm2"),
                }
            )
        return {"layers": layers, "norm": _ln(sd, "model.norm")}
    raise NotImplementedError(transformer_type)


def _mlp(sd: Mapping, n_linears: int) -> Dict:
    """Reference MLPLayers: sequential indices 0, 3, 6, ... are Linears
    (Linear, ReLU, Dropout triplets, trailing pair stripped)."""
    return {
        "layers": [_lin(sd, f"sequential.{3 * i}") for i in range(n_linears)]
    }


def convert_reference_checkpoint(
    checkpoint: Mapping, config: ConfigNode | None = None
) -> Tuple[Dict, Dict, ConfigNode]:
    """-> (params, state, config).

    ``checkpoint`` is the torch-loaded Lightning dict. Config comes from the
    pickled hyper_parameters unless overridden.
    """
    from ..models.speechclip import resolve_tower_configs

    sd = checkpoint["state_dict"]
    if config is None:
        hp = checkpoint.get("hyper_parameters", {})
        hp = _as_plain_config(hp)
        cfg_obj = hp.get("config", hp) if isinstance(hp, Mapping) else hp
        if not isinstance(cfg_obj, Mapping):
            raise ValueError(
                "could not recover a config mapping from the checkpoint's "
                f"hyper_parameters (got {type(cfg_obj).__name__}); pass "
                "config= explicitly"
            )
        config = ConfigNode(cfg_obj)

    hubert_cfg, clip_cfg = resolve_tower_configs(config)

    params: Dict = {
        "audio_encoder": hubert_from_fairseq(
            _sub_dict(sd, "audio_encoder.encoder."), hubert_cfg
        ),
        "clip": clip_from_openai(_sub_dict(sd, "clip.model."), clip_cfg),
    }
    state: Dict = {}

    if "audio_encoder.weightedsum_layer.weights" in sd:
        params["weighted_sum"] = {
            "weights": jnp.asarray(_t(sd["audio_encoder.weightedsum_layer.weights"]))
        }

    if "criterion.temperature" in sd:
        t = _t(sd["criterion.temperature"])
        if t.ndim == 0:  # trainable log(1/t) (losses.py:161)
            params["criterion"] = {"log_inv_temp": jnp.asarray(t)}
        else:
            params["criterion"] = {}
    else:
        params["criterion"] = {}

    # reduced-vocab bookkeeping: the persisted token_embedding is already
    # the reduced table; the model wrapper re-derives id maps from the npy.
    # A RELEASED checkpoint's pickled config points at the reference
    # repo's table path (avssl/data/{flickr,coco}_stat/..., configured at
    # config/.../spchclp_*.yaml:94) — persist the resolved path (vendored
    # byte-identical copy under assets/, tests/test_vocab_tables.py) into
    # the converted config so conversion works out of the box.
    reduce_path = config.clip.get("reduce_subword_embbedding")
    if reduce_path:
        from ..models.speechclip import _resolve_asset_path

        config.clip.reduce_subword_embbedding = _resolve_asset_path(
            str(reduce_path)
        )

    if any(k.startswith("cascaded_branch.") for k in sd):
        bc = config.model_settings.cascaded_branch
        c_sd = _sub_dict(sd, "cascaded_branch.")
        branch: Dict = {
            "cls": jnp.asarray(_t(c_sd["cls"])),
            "transformer": _branch_transformer(
                _sub_dict(c_sd, "self_att."),
                bc.transformer_type,
                bc.transformer_args.get("n_layers", 1),
            ),
        }
        if any(k.startswith("linear_proj.sequential") for k in c_sd):
            n_lin = len(bc.keyword.kw_projection.dimensions) - 1
            branch["proj"] = {
                "linear": None,
                "mlp": _mlp(_sub_dict(c_sd, "linear_proj."), n_lin),
            }
        else:
            branch["proj"] = {
                "linear": _lin(c_sd, "linear_proj"),
                "mlp": None,
            }
        if "vector_quantizer.curr_temp" in c_sd:
            temp_spec = bc.vq.args.temp
            if isinstance(temp_spec, str) and temp_spec.startswith("learnable"):
                branch["vq"] = {
                    "curr_temp": jnp.asarray(_t(c_sd["vector_quantizer.curr_temp"]))
                }
            else:
                branch["vq"] = {}
        else:
            branch["vq"] = {}
        if any(k.startswith("bn_layer.") for k in c_sd):
            bn_sd = _sub_dict(c_sd, "bn_layer.")
            bn_type = bc.keyword.batchnorms.type
            parallel = bc.keyword.batchnorms.get("parallel", False)
            if bn_type == "eachKw" and not parallel:
                # K separate BatchNorm1d modules -> stacked (K, D)
                k = bc.keyword.number
                branch["bn"] = {
                    "scale": jnp.stack(
                        [jnp.asarray(_t(bn_sd[f"bn_layers.{i}.weight"])) for i in range(k)]
                    ),
                    "bias": jnp.stack(
                        [jnp.asarray(_t(bn_sd[f"bn_layers.{i}.bias"])) for i in range(k)]
                    ),
                }
                bn_state = {
                    "mean": jnp.stack(
                        [
                            jnp.asarray(_t(bn_sd[f"bn_layers.{i}.running_mean"]))
                            for i in range(k)
                        ]
                    ),
                    "var": jnp.stack(
                        [
                            jnp.asarray(_t(bn_sd[f"bn_layers.{i}.running_var"]))
                            for i in range(k)
                        ]
                    ),
                }
            else:
                branch["bn"] = {
                    "scale": jnp.asarray(_t(bn_sd["bn_layer.weight"])),
                    "bias": jnp.asarray(_t(bn_sd["bn_layer.bias"])),
                }
                bn_state = {
                    "mean": jnp.asarray(_t(bn_sd["bn_layer.running_mean"])),
                    "var": jnp.asarray(_t(bn_sd["bn_layer.running_var"])),
                }
            state["cascaded_branch"] = {"bn": bn_state}
        params["cascaded_branch"] = branch

    if any(k.startswith("parallel_branch.") for k in sd):
        bp = config.model_settings.parallel_branch
        p_sd = _sub_dict(sd, "parallel_branch.")
        branch = {
            "cls": jnp.asarray(_t(p_sd["cls"])),
            "transformer": _branch_transformer(
                _sub_dict(p_sd, "self_att."),
                bp.transformer_type,
                bp.transformer_args.get("n_layers", 1),
            ),
        }
        if "linear_proj.weight" in p_sd:
            branch["proj"] = _lin(p_sd, "linear_proj")
        params["parallel_branch"] = branch

    for our_key, ref_key, cfg_key in [
        ("img_enc_proj", "img_enc_proj_net", "image_encoder_projection"),
        ("p_branch_proj", "p_branch_proj_net", "parallel_branch_projection"),
        ("c_branch_proj", "c_branch_proj_net", "cascaded_branch_projection"),
    ]:
        if any(k.startswith(ref_key + ".") for k in sd):
            proj_cfg = config.model_settings.get(cfg_key)
            n_lin = len(proj_cfg.dimensions) - 1
            params[our_key] = _mlp(_sub_dict(sd, ref_key + "."), n_lin)

    return params, state, config


def load_reference_checkpoint(path: str, config: ConfigNode | None = None):
    """torch.load the Lightning .ckpt and convert.

    Uses the tolerant unpickler: released checkpoints pickle
    pytorch_lightning/avssl classes in hyper_parameters, and neither
    package is installed here (see _tolerant_pickle_module)."""
    import torch

    ckpt = torch.load(
        path,
        map_location="cpu",
        weights_only=False,
        pickle_module=_tolerant_pickle_module(),
    )
    return convert_reference_checkpoint(ckpt, config)
