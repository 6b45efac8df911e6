"""Reference Lightning-checkpoint conversion tests.

Builds a synthetic checkpoint with the reference's exact state-dict naming
(module tree of KWClip_GeneralTransformer: audio_encoder.encoder.* fairseq
HuBERT, clip.model.* OpenAI CLIP, branch modules, kw-BN, weighted sum) using
real torch modules where naming is nontrivial, converts it, and checks the
converted branch parameters reproduce the torch modules' forward outputs.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from speechclip_tpu.config import ConfigNode
from speechclip_tpu.convert.reference_ckpt import convert_reference_checkpoint
from speechclip_tpu.models import branches
from tests import torch_ref
from tests.test_models import TINY_CLIP, TINY_HUBERT, tiny_speechclip_config


def fairseq_hubert_state_dict(rng, cfg=TINY_HUBERT):
    """Random tensors under fairseq HubertModel names (tiny dims)."""
    sd = {}
    in_ch = 1
    for i, (ch, k, s) in enumerate(cfg.conv_layers):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = torch.randn(ch, in_ch, k)
        if i == 0:
            sd[f"feature_extractor.conv_layers.{i}.2.weight"] = torch.randn(ch)
            sd[f"feature_extractor.conv_layers.{i}.2.bias"] = torch.randn(ch)
        in_ch = ch
    c_last = cfg.conv_layers[-1][0]
    d, f = cfg.encoder_embed_dim, cfg.encoder_ffn_dim
    sd["layer_norm.weight"] = torch.randn(c_last)
    sd["layer_norm.bias"] = torch.randn(c_last)
    sd["post_extract_proj.weight"] = torch.randn(d, c_last)
    sd["post_extract_proj.bias"] = torch.randn(d)
    k_pos = cfg.pos_conv_kernel
    g = cfg.pos_conv_groups
    sd["encoder.pos_conv.0.weight_g"] = torch.randn(1, 1, k_pos)
    sd["encoder.pos_conv.0.weight_v"] = torch.randn(d, d // g, k_pos)
    sd["encoder.pos_conv.0.bias"] = torch.randn(d)
    sd["encoder.layer_norm.weight"] = torch.randn(d)
    sd["encoder.layer_norm.bias"] = torch.randn(d)
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = torch.randn(d, d)
            sd[f"{p}.self_attn.{proj}.bias"] = torch.randn(d)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{p}.{ln}.weight"] = torch.randn(d)
            sd[f"{p}.{ln}.bias"] = torch.randn(d)
        sd[f"{p}.fc1.weight"] = torch.randn(f, d)
        sd[f"{p}.fc1.bias"] = torch.randn(f)
        sd[f"{p}.fc2.weight"] = torch.randn(d, f)
        sd[f"{p}.fc2.bias"] = torch.randn(d)
    return sd


def openai_clip_state_dict(cfg=TINY_CLIP, reduced_vocab_size=42):
    sd = {}
    v, t = cfg.vision, cfg.text
    grid = v.image_size // v.patch_size
    sd["visual.conv1.weight"] = torch.randn(v.width, 3, v.patch_size, v.patch_size)
    sd["visual.class_embedding"] = torch.randn(v.width)
    sd["visual.positional_embedding"] = torch.randn(grid * grid + 1, v.width)
    sd["visual.ln_pre.weight"] = torch.randn(v.width)
    sd["visual.ln_pre.bias"] = torch.randn(v.width)
    sd["visual.ln_post.weight"] = torch.randn(v.width)
    sd["visual.ln_post.bias"] = torch.randn(v.width)
    sd["visual.proj"] = torch.randn(v.width, v.output_dim)

    def block(prefix, width):
        sd[f"{prefix}.attn.in_proj_weight"] = torch.randn(3 * width, width)
        sd[f"{prefix}.attn.in_proj_bias"] = torch.randn(3 * width)
        sd[f"{prefix}.attn.out_proj.weight"] = torch.randn(width, width)
        sd[f"{prefix}.attn.out_proj.bias"] = torch.randn(width)
        for ln in ("ln_1", "ln_2"):
            sd[f"{prefix}.{ln}.weight"] = torch.randn(width)
            sd[f"{prefix}.{ln}.bias"] = torch.randn(width)
        sd[f"{prefix}.mlp.c_fc.weight"] = torch.randn(4 * width, width)
        sd[f"{prefix}.mlp.c_fc.bias"] = torch.randn(4 * width)
        sd[f"{prefix}.mlp.c_proj.weight"] = torch.randn(width, 4 * width)
        sd[f"{prefix}.mlp.c_proj.bias"] = torch.randn(width)

    for i in range(v.layers):
        block(f"visual.transformer.resblocks.{i}", v.width)
    for i in range(t.layers):
        block(f"transformer.resblocks.{i}", t.width)
    # the persisted table is already reduced (clip_official.py:86)
    sd["token_embedding.weight"] = torch.randn(reduced_vocab_size, t.width)
    sd["positional_embedding"] = torch.randn(t.context_length, t.width)
    sd["ln_final.weight"] = torch.randn(t.width)
    sd["ln_final.bias"] = torch.randn(t.width)
    sd["text_projection"] = torch.randn(t.width, t.output_dim)
    sd["logit_scale"] = torch.tensor(2.6593)
    return sd


def build_reference_ckpt(config):
    """Synthetic Lightning .ckpt dict (the reference's exact state-dict
    naming) for the given tiny config -> (ckpt, torch_modules). Shared
    with tests/test_verify_parity.py, which drives the parity recipe over
    a saved copy of this checkpoint."""
    torch.manual_seed(0)
    d = 32
    sd = {}
    for k, v in fairseq_hubert_state_dict(np.random.default_rng(0)).items():
        sd[f"audio_encoder.encoder.{k}"] = v
    sd["audio_encoder.weightedsum_layer.weights"] = torch.randn(3)
    for k, v in openai_clip_state_dict().items():
        sd[f"clip.model.{k}"] = v

    # parallel branch: real torch modules give the exact names
    p_enc = torch_ref.make_torch_encoder(n_layers=1, d_model=d, nhead=4, dim_feedforward=64)
    p_lin = torch.nn.Linear(d, 16)
    sd["parallel_branch.cls"] = torch.randn(1, 1, d)
    for k, v in p_enc.state_dict().items():
        sd[f"parallel_branch.self_att.model.{k}"] = v
    for k, v in p_lin.state_dict().items():
        sd[f"parallel_branch.linear_proj.{k}"] = v

    # cascaded branch
    c_mha, c_norm = torch_ref.make_torch_mha_and_norm(d_model=d, nhead=1)
    c_lin = torch.nn.Linear(d, d)
    c_bn = torch.nn.BatchNorm1d(d * 4)
    c_bn.running_mean.normal_()
    c_bn.running_var.uniform_(0.5, 2.0)
    sd["cascaded_branch.cls"] = torch.randn(1, 4, d)
    for k, v in c_mha.state_dict().items():
        sd[f"cascaded_branch.self_att.multihead_attn_layer.{k}"] = v
    for k, v in c_norm.state_dict().items():
        sd[f"cascaded_branch.self_att.attentionBlock_Norm.{k}"] = v
    for k, v in c_lin.state_dict().items():
        sd[f"cascaded_branch.linear_proj.{k}"] = v
    for k, v in c_bn.state_dict().items():
        sd[f"cascaded_branch.bn_layer.bn_layer.{k}"] = v
    sd["cascaded_branch.vector_quantizer.curr_temp"] = torch.tensor([0.1])

    ckpt = {
        "state_dict": sd,
        "hyper_parameters": {"config": config.to_dict()},
    }
    torch_modules = {
        "p_enc": p_enc,
        "p_lin": p_lin,
        "c_mha": c_mha,
        "c_norm": c_norm,
        "c_lin": c_lin,
        "c_bn": c_bn,
        "p_cls": sd["parallel_branch.cls"],
        "c_cls": sd["cascaded_branch.cls"],
    }
    return ckpt, torch_modules


@pytest.fixture
def reference_checkpoint(tmp_path):
    config = tiny_speechclip_config(tmp_path)
    ckpt, torch_modules = build_reference_ckpt(config)
    return ckpt, config, torch_modules


class TestReferenceCheckpointConversion:
    def test_structure_and_values(self, reference_checkpoint):
        ckpt, config, _ = reference_checkpoint
        params, state, out_config = convert_reference_checkpoint(ckpt, config)
        assert "audio_encoder" in params and "clip" in params
        assert params["weighted_sum"]["weights"].shape == (3,)
        assert params["clip"]["text"]["token_embedding"].shape[0] == 42
        # weight-norm folded pos_conv: w = g * v / ||v||
        v = ckpt["state_dict"]["audio_encoder.encoder.encoder.pos_conv.0.weight_v"].numpy()
        g = ckpt["state_dict"]["audio_encoder.encoder.encoder.pos_conv.0.weight_g"].numpy()
        norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True))
        expected = (g * v / norm).transpose(2, 1, 0)
        np.testing.assert_allclose(
            np.asarray(params["audio_encoder"]["encoder"]["pos_conv"]["w"]),
            expected,
            atol=1e-5,
        )
        # kw-BN running stats land in state
        assert "cascaded_branch" in state
        np.testing.assert_allclose(
            np.asarray(state["cascaded_branch"]["bn"]["mean"]),
            ckpt["state_dict"]["cascaded_branch.bn_layer.bn_layer.running_mean"].numpy(),
        )

    def test_parallel_branch_forward_matches_torch(self, reference_checkpoint):
        ckpt, config, mods = reference_checkpoint
        params, _, _ = convert_reference_checkpoint(ckpt, config)
        rng = np.random.default_rng(1)
        feat = rng.standard_normal((2, 9, 32)).astype(np.float32)
        lens = np.array([9, 5])

        out_j = branches.parallel_branch_apply(
            params["parallel_branch"],
            config.model_settings.parallel_branch,
            jnp.asarray(feat),
            jnp.asarray(lens),
        )

        enc, lin = mods["p_enc"], mods["p_lin"]
        enc.eval()
        cls = mods["p_cls"]
        src = torch.cat([cls.expand(2, 1, 32), torch.tensor(feat)], dim=1)
        kpm = torch.zeros(2, 10, dtype=torch.bool)
        kpm[1, 6:] = True
        with torch.no_grad():
            out_t = lin(enc(src, src_key_padding_mask=kpm)[:, 0])
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-4)

    def test_cascaded_attention_matches_torch(self, reference_checkpoint):
        ckpt, config, mods = reference_checkpoint
        params, _, _ = convert_reference_checkpoint(ckpt, config)
        rng = np.random.default_rng(2)
        feat = rng.standard_normal((2, 7, 32)).astype(np.float32)
        lens = np.array([7, 4])

        hiddens = branches.cascaded_branch_hidden_states(
            params["cascaded_branch"],
            config.model_settings.cascaded_branch,
            jnp.asarray(feat),
            jnp.asarray(lens),
        )
        out_j = hiddens[-1]

        mha, norm = mods["c_mha"], mods["c_norm"]
        mha.eval()
        cls = mods["c_cls"]
        src = torch.cat([cls.expand(2, 4, 32), torch.tensor(feat)], dim=1)
        kpm = torch.zeros(2, 11, dtype=torch.bool)
        kpm[1, 8:] = True
        with torch.no_grad():
            attn, _ = mha(src, src, src, key_padding_mask=kpm)
            out_t = norm(attn + src)[:, 4:]
        np.testing.assert_allclose(
            np.asarray(out_j)[0], out_t.numpy()[0], atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_j)[1, :4], out_t.numpy()[1, :4], atol=2e-4
        )

    def test_full_model_forward_with_converted_params(self, reference_checkpoint):
        ckpt, config, _ = reference_checkpoint
        from speechclip_tpu.models.speechclip import SpeechCLIPModel

        params, state, _ = convert_reference_checkpoint(ckpt, config)
        model = SpeechCLIPModel(config)
        rng = np.random.default_rng(3)
        batch = {
            "wav": jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32)),
            "wav_len": jnp.asarray(np.array([2000, 1500])),
            "image": jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32)),
            "id": jnp.asarray(np.array([0, 1])),
        }
        loss_feats, _, others, _ = model.forward(params, state, batch)
        losses = model.compute_loss(params, loss_feats)
        assert np.isfinite(float(losses["loss"]))
        assert others["keywords"].shape == (2, 4, 32)


def test_released_ckpt_unpickles_without_avssl_or_lightning(tmp_path):
    """A REAL released checkpoint's hyper_parameters pickle references
    pytorch_lightning.utilities.parsing.AttributeDict wrapping an avssl
    OrderedNamespace config tree — neither package is installed here. The
    tolerant unpickler must resolve them to stubs and _as_plain_config must
    flatten the OrderedNamespace state (which lives in __dict__['_odict'],
    NOT on the mapping surface) back to nested plain dicts, so get_path
    sees the checkpoint's real values instead of silently falling back to
    defaults (or crashing at torch.load with ModuleNotFoundError).

    Faithfulness: the fixture SAVES through clone classes registered under
    the real module paths, then REMOVES them before loading."""
    import sys
    import types
    from collections import OrderedDict

    from speechclip_tpu.convert.reference_ckpt import (
        load_reference_checkpoint,
    )

    fake_names = [
        "avssl", "avssl.base", "avssl.base.ordered_namespace",
        "pytorch_lightning", "pytorch_lightning.utilities",
        "pytorch_lightning.utilities.parsing",
    ]
    assert all(n not in sys.modules for n in fake_names)

    class OrderedNamespace:  # state layout per avssl/base/ordered_namespace.py
        def __init__(self, data):
            object.__setattr__(self, "_odict", OrderedDict())
            for k, v in data.items():
                self._odict[k] = (
                    OrderedNamespace(v) if isinstance(v, dict) else v
                )

        def __setattr__(self, key, val):
            self._odict[key] = val

    class AttributeDict(dict):
        pass

    OrderedNamespace.__module__ = "avssl.base.ordered_namespace"
    OrderedNamespace.__qualname__ = "OrderedNamespace"
    AttributeDict.__module__ = "pytorch_lightning.utilities.parsing"
    AttributeDict.__qualname__ = "AttributeDict"

    mods = {n: types.ModuleType(n) for n in fake_names}
    mods["avssl.base.ordered_namespace"].OrderedNamespace = OrderedNamespace
    mods["pytorch_lightning.utilities.parsing"].AttributeDict = AttributeDict
    sys.modules.update(mods)
    try:
        config = tiny_speechclip_config(tmp_path)
        ckpt, _ = build_reference_ckpt(config)
        ckpt["hyper_parameters"] = AttributeDict(
            config=OrderedNamespace(config.to_dict())
        )
        path = tmp_path / "released_style.ckpt"
        torch.save(ckpt, str(path))
    finally:
        for n in fake_names:
            sys.modules.pop(n, None)

    params, state, out_config = load_reference_checkpoint(str(path))
    assert "audio_encoder" in params and "clip" in params
    # deep nested values must survive (the old __dict__ extraction lost
    # EVERYTHING below the top level)
    want = config.get_path("model_settings.cascaded_branch.transformer_type")
    assert (
        out_config.get_path("model_settings.cascaded_branch.transformer_type")
        == want
    )
    assert out_config.get_path(
        "model_settings.cascaded_branch.keyword.number"
    ) == config.get_path("model_settings.cascaded_branch.keyword.number")


def test_released_ckpt_stat_path_remaps_to_vendored(reference_checkpoint):
    """A released checkpoint's pickled config points at the REFERENCE
    repo's stat-table path; conversion must remap it to the vendored copy
    in assets/ so the model constructs out of the box."""
    ckpt, config, _ = reference_checkpoint
    import copy

    cfg = ConfigNode(copy.deepcopy(config.to_dict()))
    cfg.clip.reduce_subword_embbedding = (
        "avssl/data/flickr_stat/text_clip_vocab_usage_byfreq.npy"
    )
    _, _, out_cfg = convert_reference_checkpoint(ckpt, cfg)
    resolved = out_cfg.clip.reduce_subword_embbedding
    import os

    assert os.path.isabs(resolved) and os.path.exists(resolved), resolved
    assert resolved.endswith(
        "assets/flickr_stat/text_clip_vocab_usage_byfreq.npy"
    )
    import numpy as _np

    assert _np.load(resolved).shape == (8112, 2)


class TestLightningCkptToServing:
    """The reference user's switch-over surface: a Lightning ``.ckpt`` ON
    DISK -> EncoderService.from_checkpoint -> served features equal the
    converted model's direct math. Covers load_any_checkpoint's .ckpt
    branch (training/checkpoint.py) and load_reference_checkpoint
    (convert/reference_ckpt.py:231), which the in-memory conversion tests
    above never exercise. Reference anchor: example.py:10-40 — loading the
    released .ckpt is the reference's only deployment story."""

    def test_from_checkpoint_lightning_file(
        self, reference_checkpoint, tmp_path
    ):
        ckpt, _, _ = reference_checkpoint
        path = tmp_path / "epoch=42-step=1234.ckpt"
        torch.save(ckpt, str(path))

        from speechclip_tpu.serving import EncoderService
        from speechclip_tpu.training.checkpoint import load_any_checkpoint

        model, params, state = load_any_checkpoint(str(path))
        svc = EncoderService.from_checkpoint(
            str(path), wav_buckets=(2000,), batch=2, max_wait_ms=5.0
        )
        try:
            rng = np.random.default_rng(7)
            wav = rng.standard_normal(1800).astype(np.float32)
            got = svc.encode_speech(wav)
            padded = np.zeros((1, 2000), np.float32)
            padded[0, :1800] = wav
            want = model.encode_speech(
                params, state, jnp.asarray(padded), jnp.asarray([1800])
            )
            for key in ("parallel_audio_feat", "cascaded_audio_feat"):
                np.testing.assert_allclose(
                    got[key], np.asarray(want[key])[0], atol=1e-5
                )
        finally:
            svc.close()
