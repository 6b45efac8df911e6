"""Full-size architecture parity: real HuBERT-base / CLIP ViT-B/32 dims vs
randomly-initialized HuggingFace torch models. Slower than the tiny tests
but exercises the production shapes (768-d, 12 layers, pos_conv groups=16,
7-conv frontend, 224px/32px patches)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from speechclip_tpu.convert import clip_from_hf, hubert_from_hf
from speechclip_tpu.models import clip as clip_mod
from speechclip_tpu.models import hubert as hubert_mod

pytestmark = pytest.mark.slow


class TestFullSizeHubert:
    def test_hubert_base_matches_hf(self):
        from transformers import HubertConfig, HubertModel

        torch.manual_seed(0)
        hf = HubertModel(
            HubertConfig(  # hubert-base architecture
                hidden_size=768,
                num_hidden_layers=12,
                num_attention_heads=12,
                intermediate_size=3072,
                feat_extract_norm="group",
                conv_bias=False,
                do_stable_layer_norm=False,
                hidden_dropout=0.0,
                attention_dropout=0.0,
                feat_proj_dropout=0.0,
                activation_dropout=0.0,
                layerdrop=0.0,
                apply_spec_augment=False,
            )
        )
        hf.eval()
        wav = np.random.default_rng(0).standard_normal((1, 16000)).astype(np.float32)
        with torch.no_grad():
            out = hf(torch.tensor(wav), output_hidden_states=True)
        params = hubert_from_hf(
            {k: v.numpy() for k, v in hf.state_dict().items()},
            hubert_mod.HUBERT_BASE,
        )
        hiddens, feat_len = hubert_mod.hubert_apply(
            params,
            hubert_mod.HUBERT_BASE,
            jnp.asarray(wav),
            jnp.asarray(np.array([16000])),
        )
        assert len(hiddens) == 13 == len(out.hidden_states)
        # tolerances grow through 12 layers of f32 accumulation differences
        for i, (ours, theirs) in enumerate(zip(hiddens, out.hidden_states)):
            np.testing.assert_allclose(
                np.asarray(ours), theirs.numpy(), atol=3e-3,
                err_msg=f"hidden state {i}",
            )
        # 16000 samples -> 49 frames; round(16000/320)=50 clamps to 49
        np.testing.assert_array_equal(np.asarray(feat_len), [49])

    def test_hubert_large_matches_hf(self):
        """The PRE-norm (do_stable_layer_norm) path at production dims:
        1024-d, 24 layers, layer_norm conv extractor with conv biases,
        per-utterance waveform normalization (fairseq task.cfg.normalize;
        HF expects pre-normalized input, so the oracle gets the host-side
        equivalent of our in-model normalization)."""
        from transformers import HubertConfig, HubertModel

        torch.manual_seed(2)
        hf = HubertModel(
            HubertConfig(
                hidden_size=1024,
                num_hidden_layers=24,
                num_attention_heads=16,
                intermediate_size=4096,
                feat_extract_norm="layer",
                conv_bias=True,
                do_stable_layer_norm=True,
                hidden_dropout=0.0,
                attention_dropout=0.0,
                feat_proj_dropout=0.0,
                activation_dropout=0.0,
                layerdrop=0.0,
                apply_spec_augment=False,
            )
        )
        hf.eval()
        wav = np.random.default_rng(4).standard_normal((1, 16000)).astype(
            np.float32
        )
        normed = (wav - wav.mean(axis=1, keepdims=True)) / np.sqrt(
            wav.var(axis=1, keepdims=True) + 1e-5
        )
        with torch.no_grad():
            out = hf(torch.tensor(normed), output_hidden_states=True)
        params = hubert_from_hf(
            {k: v.numpy() for k, v in hf.state_dict().items()},
            hubert_mod.HUBERT_LARGE,
        )
        hiddens, feat_len = hubert_mod.hubert_apply(
            params,
            hubert_mod.HUBERT_LARGE,  # normalize_waveform=True: raw wav in
            jnp.asarray(wav),
            jnp.asarray(np.array([16000])),
        )
        assert len(hiddens) == 25 == len(out.hidden_states)
        # contract difference on the LAST state only: the reference's custom
        # fairseq forward never applies the pre-norm model's final
        # encoder.layer_norm (speech_encoder_plus.py:29-64 has no post-loop
        # norm), so our states are raw layer outputs; HF's final
        # hidden_states entry IS post-norm. States 0..23 compare directly;
        # the last compares after applying the (converted) final norm.
        for i in range(24):
            np.testing.assert_allclose(
                np.asarray(hiddens[i]), out.hidden_states[i].numpy(),
                atol=5e-3, err_msg=f"hidden state {i}",
            )
        from speechclip_tpu.ops.basic import layer_norm

        final = layer_norm(params["encoder"]["layer_norm"], hiddens[24])
        np.testing.assert_allclose(
            np.asarray(final), out.hidden_states[24].numpy(), atol=5e-3,
            err_msg="final state (+encoder.layer_norm)",
        )
        np.testing.assert_array_equal(np.asarray(feat_len), [49])


class TestFullSizeCLIP:
    def test_vit_b32_matches_hf(self):
        from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

        torch.manual_seed(1)
        hf = CLIPModel(
            CLIPConfig.from_text_vision_configs(
                CLIPTextConfig(
                    vocab_size=49408,
                    hidden_size=512,
                    intermediate_size=2048,
                    num_hidden_layers=12,
                    num_attention_heads=8,
                    max_position_embeddings=77,
                    hidden_act="quick_gelu",
                    eos_token_id=49407,
                    bos_token_id=49406,
                ),
                CLIPVisionConfig(
                    image_size=224,
                    patch_size=32,
                    hidden_size=768,
                    intermediate_size=3072,
                    num_hidden_layers=12,
                    num_attention_heads=12,
                    hidden_act="quick_gelu",
                ),
                projection_dim=512,
            )
        )
        hf.eval()
        params = clip_from_hf(
            {k: v.numpy() for k, v in hf.state_dict().items()},
            clip_mod.CLIP_VIT_B32,
        )

        images = np.random.default_rng(2).standard_normal((1, 3, 224, 224)).astype(
            np.float32
        )
        with torch.no_grad():
            img_t = hf.get_image_features(pixel_values=torch.tensor(images))
        img_j = clip_mod.encode_image(
            params, clip_mod.CLIP_VIT_B32, jnp.asarray(images.transpose(0, 2, 3, 1))
        )
        np.testing.assert_allclose(np.asarray(img_j), img_t.numpy(), atol=3e-3)

        rng = np.random.default_rng(3)
        text = np.zeros((2, 77), np.int64)
        eots = []
        for i in range(2):
            n = rng.integers(5, 20)
            text[i, 0] = 49406
            text[i, 1 : 1 + n] = rng.integers(1, 49000, n)
            text[i, 1 + n] = 49407
            eots.append(1 + n)
        with torch.no_grad():
            txt_t = hf.get_text_features(input_ids=torch.tensor(text))
        txt_j = clip_mod.encode_text(
            params, clip_mod.CLIP_VIT_B32, jnp.asarray(text), jnp.asarray(np.array(eots))
        )
        np.testing.assert_allclose(np.asarray(txt_j), txt_t.numpy(), atol=3e-3)

        # encode_keywords consistency at full size
        k = 8
        toks = rng.integers(1, 49000, (1, k))
        buf = np.zeros((1, 77), np.int64)
        buf[:, 0] = 49406
        buf[:, 1 : 1 + k] = toks
        buf[:, 1 + k] = 49407
        ref = clip_mod.encode_text(
            params, clip_mod.CLIP_VIT_B32, jnp.asarray(buf), jnp.full((1,), k + 1)
        )
        kw_emb = params["text"]["token_embedding"][jnp.asarray(toks)]
        out = clip_mod.encode_keywords(
            params, clip_mod.CLIP_VIT_B32, kw_emb, 49406, 49407
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


class TestFullSizeCLIPLarge:
    def test_vit_l14_matches_hf(self):
        """The second shipped tower family at production dims: ViT-L/14
        vision (1024-d, 24 layers, patch 14 -> 257 tokens) + 768-wide text
        tower, 768-d joint space (large flickr/coco configs)."""
        from transformers import (
            CLIPConfig,
            CLIPModel,
            CLIPTextConfig,
            CLIPVisionConfig,
        )

        torch.manual_seed(3)
        hf = CLIPModel(
            CLIPConfig.from_text_vision_configs(
                CLIPTextConfig(
                    vocab_size=49408,
                    hidden_size=768,
                    intermediate_size=3072,
                    num_hidden_layers=12,
                    num_attention_heads=12,
                    max_position_embeddings=77,
                    hidden_act="quick_gelu",
                    eos_token_id=49407,
                    bos_token_id=49406,
                ),
                CLIPVisionConfig(
                    image_size=224,
                    patch_size=14,
                    hidden_size=1024,
                    intermediate_size=4096,
                    num_hidden_layers=24,
                    num_attention_heads=16,
                    hidden_act="quick_gelu",
                ),
                projection_dim=768,
            )
        )
        hf.eval()
        params = clip_from_hf(
            {k: v.numpy() for k, v in hf.state_dict().items()},
            clip_mod.CLIP_VIT_L14,
        )

        images = np.random.default_rng(5).standard_normal(
            (1, 3, 224, 224)
        ).astype(np.float32)
        with torch.no_grad():
            img_t = hf.get_image_features(pixel_values=torch.tensor(images))
        img_j = clip_mod.encode_image(
            params, clip_mod.CLIP_VIT_L14, jnp.asarray(images.transpose(0, 2, 3, 1))
        )
        np.testing.assert_allclose(np.asarray(img_j), img_t.numpy(), atol=5e-3)

        text = np.zeros((1, 77), np.int64)
        text[0, 0] = 49406
        text[0, 1:9] = np.arange(100, 108)
        text[0, 9] = 49407
        with torch.no_grad():
            txt_t = hf.get_text_features(input_ids=torch.tensor(text))
        txt_j = clip_mod.encode_text(
            params, clip_mod.CLIP_VIT_L14, jnp.asarray(text),
            jnp.asarray(np.array([9])),
        )
        np.testing.assert_allclose(np.asarray(txt_j), txt_t.numpy(), atol=5e-3)


class TestFullSizeEndToEnd:
    """End-to-end anchor at production dims while the released checkpoints
    are unreachable (zero-egress environment; the download attempt is logged
    in docs/DESIGN_NOTES.md): a synthetic reference Lightning checkpoint at
    FULL size (fairseq hubert-base naming, OpenAI ViT-B/32 naming, reduced
    vocab with the shipped pad/SOT/EOT byfreq row layout) through the whole
    chain — conversion -> SpeechCLIPModel encode_speech / forward_image ->
    retrieval recall — not just per-branch forwards.

    Reference chain: download_ckpts.sh:7-9, example.py:10-40,
    kwClip.py:468-502."""

    REDUCED_V = 8112  # shipped Flickr table size (SURVEY.md §2.4)

    def _full_config(self, tmp_path):
        import os

        from __graft_entry__ import _flagship_config

        # the REAL shipped Flickr byfreq table (vendored from the reference's
        # avssl/data/flickr_stat/; rows 0/2/3 = pad/SOT/EOT) so this anchor
        # exercises the true id-mapping contract, not a synthetic stand-in
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        npy = os.path.join(
            repo, "assets", "flickr_stat", "text_clip_vocab_usage_byfreq.npy"
        )
        assert os.path.exists(npy)

        cfg = _flagship_config()
        cfg.clip.reduce_subword_embbedding = str(npy)
        cfg.trainer.precision = 32
        return cfg

    def test_convert_encode_retrieve(self, tmp_path):
        from speechclip_tpu.convert.reference_ckpt import (
            convert_reference_checkpoint,
        )
        from speechclip_tpu.models.speechclip import SpeechCLIPModel
        from speechclip_tpu.training.evaluation import (
            collect_validation_outputs,
            retrieval_metrics,
        )
        from tests import torch_ref
        from tests.test_reference_ckpt import (
            fairseq_hubert_state_dict,
            openai_clip_state_dict,
        )

        torch.manual_seed(0)
        cfg = self._full_config(tmp_path)
        d, out_dim, kw = 768, 512, 8

        sd = {}
        for k, v in fairseq_hubert_state_dict(
            np.random.default_rng(0), hubert_mod.HUBERT_BASE
        ).items():
            # temper the conv stack: random std-1 kernels through 7 unnormed
            # convs produce huge (finite) activations that saturate softmax
            sd[f"audio_encoder.encoder.{k}"] = (
                v * 0.1 if k.startswith("feature_extractor") else v
            )
        sd["audio_encoder.weightedsum_layer.weights"] = torch.randn(13)
        for k, v in openai_clip_state_dict(
            clip_mod.CLIP_VIT_B32, reduced_vocab_size=self.REDUCED_V
        ).items():
            sd[f"clip.model.{k}"] = v

        p_enc = torch_ref.make_torch_encoder(
            n_layers=1, d_model=d, nhead=8, dim_feedforward=3072
        )
        p_lin = torch.nn.Linear(d, out_dim)
        sd["parallel_branch.cls"] = torch.randn(1, 1, d)
        for k, v in p_enc.state_dict().items():
            sd[f"parallel_branch.self_att.model.{k}"] = v
        for k, v in p_lin.state_dict().items():
            sd[f"parallel_branch.linear_proj.{k}"] = v

        c_mha, c_norm = torch_ref.make_torch_mha_and_norm(d_model=d, nhead=1)
        c_lin = torch.nn.Linear(d, out_dim)
        c_bn = torch.nn.BatchNorm1d(out_dim * kw)
        c_bn.running_mean.normal_()
        c_bn.running_var.uniform_(0.5, 2.0)
        sd["cascaded_branch.cls"] = torch.randn(1, kw, d)
        for k, v in c_mha.state_dict().items():
            sd[f"cascaded_branch.self_att.multihead_attn_layer.{k}"] = v
        for k, v in c_norm.state_dict().items():
            sd[f"cascaded_branch.self_att.attentionBlock_Norm.{k}"] = v
        for k, v in c_lin.state_dict().items():
            sd[f"cascaded_branch.linear_proj.{k}"] = v
        for k, v in c_bn.state_dict().items():
            sd[f"cascaded_branch.bn_layer.bn_layer.{k}"] = v
        sd["cascaded_branch.vector_quantizer.curr_temp"] = torch.tensor([0.1])

        ckpt = {"state_dict": sd, "hyper_parameters": {"config": cfg.to_dict()}}
        params, state, _ = convert_reference_checkpoint(ckpt, cfg)
        model = SpeechCLIPModel(cfg)

        # production-dim invariants of the converted tree
        assert params["clip"]["text"]["token_embedding"].shape == (
            self.REDUCED_V,
            512,
        )
        assert params["audio_encoder"]["encoder"]["layers"][11]["fc1"]["w"].shape == (
            768,
            3072,
        )
        assert model.sot_id == 2 and model.eot_id == 3  # shipped row layout

        # encode 6 utterances (2 s) and 3 images; ids pair 2 wavs per image
        rng = np.random.default_rng(1)
        wav = jnp.asarray(rng.standard_normal((6, 32000)).astype(np.float32))
        wav_len = jnp.asarray(np.array([32000, 28000, 24000, 32000, 20000, 16000]))
        images = jnp.asarray(
            rng.standard_normal((3, 224, 224, 3)).astype(np.float32)
        )
        ids = np.array([0, 0, 1, 1, 2, 2])

        out = model.encode_speech(params, state, wav, wav_len)
        img_feat = model.forward_image(params, images)
        assert out["parallel_audio_feat"].shape == (6, 512)
        assert out["cascaded_audio_feat"].shape == (6, 512)
        assert out["keywords"].shape == (6, kw, 512)
        assert img_feat.shape == (3, 512)
        for v in (out["parallel_audio_feat"], out["cascaded_audio_feat"], img_feat):
            assert bool(jnp.isfinite(v).all())
        # VQ diagnostics ride along (reference vq_results contract)
        assert {"code_perplexity", "prob_perplexity", "temp"} <= set(
            out["vq_results"]
        )

        # retrieval epoch logic on the encoded features
        img_per_wav = np.asarray(img_feat)[ids]  # image of each wav's pair id
        outputs = [
            {
                "id": ids,
                "audio_feat": np.asarray(out["parallel_audio_feat"]),
                "image_feat": img_per_wav,
            }
        ]
        collected = collect_validation_outputs(outputs)
        r_ab, r_ba, r_mean = retrieval_metrics(collected, [1, 5])
        for rec in (r_ab, r_ba, r_mean):
            assert set(rec) == {"recall@1", "recall@5"}
            assert all(0.0 <= v <= 100.0 for v in rec.values())
        # 3 gallery images -> recall@5 saturates
        assert r_mean["recall@5"] == 100.0

        # determinism of the full encode chain
        out2 = model.encode_speech(params, state, wav, wav_len)
        np.testing.assert_array_equal(
            np.asarray(out["parallel_audio_feat"]),
            np.asarray(out2["parallel_audio_feat"]),
        )


def fairseq_sd_from_hf_hubert(hf) -> dict:
    """HF HubertModel state dict -> fairseq HubertModel naming (the naming
    convert_reference_checkpoint consumes; reference checkpoints persist
    fairseq names under audio_encoder.encoder.*). Mechanical rename:
    HF feature_extractor.conv_layers.i.conv -> conv_layers.i.0 (+ .2 group
    norm on layer 0), feature_projection -> layer_norm/post_extract_proj,
    pos_conv parametrizations original0/1 -> weight_g/weight_v,
    attention -> self_attn, feed_forward.{intermediate,output}_dense ->
    fc{1,2}."""
    # fairseq wraps the "layer_norm"-mode per-conv LN in
    # Sequential(TransposeLast, LayerNorm, TransposeLast) -> params at .2.1;
    # the "group"-mode GroupNorm sits directly at .2 (base, layer 0 only)
    conv_ln = ".2.1." if hf.config.feat_extract_norm == "layer" else ".2."
    sd = {}
    for k, v in hf.state_dict().items():
        if k == "masked_spec_embed":  # spec-augment only; not in eval path
            continue
        k2 = k
        if "conv_layers" in k2:  # frontend convs only (not pos_conv)
            k2 = k2.replace(".conv.weight", ".0.weight")
            k2 = k2.replace(".conv.bias", ".0.bias")
            k2 = k2.replace(".layer_norm.", conv_ln)
        k2 = k2.replace("feature_projection.layer_norm", "layer_norm")
        k2 = k2.replace("feature_projection.projection", "post_extract_proj")
        k2 = k2.replace(
            "encoder.pos_conv_embed.conv.parametrizations.weight.original0",
            "encoder.pos_conv.0.weight_g",
        )
        k2 = k2.replace(
            "encoder.pos_conv_embed.conv.parametrizations.weight.original1",
            "encoder.pos_conv.0.weight_v",
        )
        k2 = k2.replace("encoder.pos_conv_embed.conv.bias", "encoder.pos_conv.0.bias")
        k2 = k2.replace(".attention.", ".self_attn.")
        if ".layers." in k2 and ".final_layer_norm." not in k2:
            # HF per-layer post-attention LN is named bare `layer_norm`
            k2 = k2.replace(".layer_norm.", ".self_attn_layer_norm.")
        k2 = k2.replace(".feed_forward.intermediate_dense.", ".fc1.")
        k2 = k2.replace(".feed_forward.output_dense.", ".fc2.")
        sd[k2] = v.clone()
    return sd


def openai_sd_from_hf_clip(hf, selected_ids=None) -> dict:
    """HF CLIPModel state dict -> OpenAI clip naming (what the reference
    persists under clip.model.*, clip_official.py). When selected_ids is
    given, the text token embedding is reduced exactly like the reference
    does at clip_official.py:86 (the checkpoint persists the REDUCED
    table)."""
    hsd = {k: v.clone() for k, v in hf.state_dict().items()}
    sd = {}

    def blocks(src_prefix, dst_prefix, n):
        for i in range(n):
            s = f"{src_prefix}.layers.{i}"
            d = f"{dst_prefix}.resblocks.{i}"
            sd[f"{d}.attn.in_proj_weight"] = torch.cat(
                [hsd[f"{s}.self_attn.{p}_proj.weight"] for p in "qkv"]
            )
            sd[f"{d}.attn.in_proj_bias"] = torch.cat(
                [hsd[f"{s}.self_attn.{p}_proj.bias"] for p in "qkv"]
            )
            sd[f"{d}.attn.out_proj.weight"] = hsd[f"{s}.self_attn.out_proj.weight"]
            sd[f"{d}.attn.out_proj.bias"] = hsd[f"{s}.self_attn.out_proj.bias"]
            for ln_dst, ln_src in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
                sd[f"{d}.{ln_dst}.weight"] = hsd[f"{s}.{ln_src}.weight"]
                sd[f"{d}.{ln_dst}.bias"] = hsd[f"{s}.{ln_src}.bias"]
            sd[f"{d}.mlp.c_fc.weight"] = hsd[f"{s}.mlp.fc1.weight"]
            sd[f"{d}.mlp.c_fc.bias"] = hsd[f"{s}.mlp.fc1.bias"]
            sd[f"{d}.mlp.c_proj.weight"] = hsd[f"{s}.mlp.fc2.weight"]
            sd[f"{d}.mlp.c_proj.bias"] = hsd[f"{s}.mlp.fc2.bias"]

    v_layers = hf.config.vision_config.num_hidden_layers
    t_layers = hf.config.text_config.num_hidden_layers
    blocks("vision_model.encoder", "visual.transformer", v_layers)
    blocks("text_model.encoder", "transformer", t_layers)

    sd["visual.conv1.weight"] = hsd["vision_model.embeddings.patch_embedding.weight"]
    sd["visual.class_embedding"] = hsd["vision_model.embeddings.class_embedding"]
    sd["visual.positional_embedding"] = hsd[
        "vision_model.embeddings.position_embedding.weight"
    ]
    sd["visual.ln_pre.weight"] = hsd["vision_model.pre_layrnorm.weight"]
    sd["visual.ln_pre.bias"] = hsd["vision_model.pre_layrnorm.bias"]
    sd["visual.ln_post.weight"] = hsd["vision_model.post_layernorm.weight"]
    sd["visual.ln_post.bias"] = hsd["vision_model.post_layernorm.bias"]
    sd["visual.proj"] = hsd["visual_projection.weight"].T.contiguous()

    tok = hsd["text_model.embeddings.token_embedding.weight"]
    if selected_ids is not None:
        tok = tok[torch.as_tensor(np.asarray(selected_ids))]
    sd["token_embedding.weight"] = tok
    sd["positional_embedding"] = hsd["text_model.embeddings.position_embedding.weight"]
    sd["ln_final.weight"] = hsd["text_model.final_layer_norm.weight"]
    sd["ln_final.bias"] = hsd["text_model.final_layer_norm.bias"]
    sd["text_projection"] = hsd["text_projection.weight"].T.contiguous()
    sd["logit_scale"] = hsd["logit_scale"]
    return sd


def torch_clip_text_tower(hf, x):
    """OpenAI text transformer on embedding input x (B, L, W) — HF's
    CLIPTextModel cannot take inputs_embeds, so run its layers manually
    with the causal mask (clip_official.py:248-258 semantics)."""
    tm = hf.text_model
    L = x.shape[1]
    x = x + tm.embeddings.position_embedding.weight[:L]
    causal = torch.triu(torch.full((L, L), float("-inf")), 1)
    for layer in tm.encoder.layers:
        sa = layer.self_attn
        h = layer.layer_norm1(x)
        B, _, W = h.shape
        nh = sa.num_heads
        hd = W // nh
        q = sa.q_proj(h).view(B, L, nh, hd).transpose(1, 2) * sa.scale
        k = sa.k_proj(h).view(B, L, nh, hd).transpose(1, 2)
        v = sa.v_proj(h).view(B, L, nh, hd).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) + causal, dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(B, L, W)
        x = x + sa.out_proj(o)
        h = layer.layer_norm2(x)
        x = x + layer.mlp.fc2(layer.mlp.activation_fn(layer.mlp.fc1(h)))
    return tm.final_layer_norm(x)


class TestFullModelTorchOracle:
    """ONE end-to-end torch composite forward vs the converted JAX model at
    production dims (VERDICT r2 next-round #3): conversion, reduced-vocab id
    mapping (REAL shipped Flickr table), weighted sum, both branches, kw-BN
    (eval running stats), cosine-vs-embedding scores, VQ hard masking,
    keyword text-tower encode, and retrieval are pinned against torch in a
    single chain, so regressions cannot hide between per-module unit tests.

    The torch side composes HF HubertModel + HF CLIPModel + real torch
    branch modules exactly the way the reference forward does
    (kwClip.py:856-916 cascaded, :1101-1106 parallel, clip_official.py:
    220-264 encode_keywords, my_vector_quantizer.py:70-145 eval VQ,
    kw_bn.py:115-124 parallel eachKw)."""

    K = 8

    def test_composite_forward_matches(self, tmp_path):
        import torch.nn.functional as F
        from transformers import (
            CLIPConfig,
            CLIPModel,
            CLIPTextConfig,
            CLIPVisionConfig,
            HubertConfig,
            HubertModel,
        )

        from speechclip_tpu.convert.reference_ckpt import (
            convert_reference_checkpoint,
        )
        from speechclip_tpu.models.speechclip import SpeechCLIPModel
        from tests import torch_ref

        torch.manual_seed(13)  # seed chosen for comfortable VQ top-2 margins
        d, out_dim, K = 768, 512, self.K

        hf_hubert = HubertModel(
            HubertConfig(
                hidden_size=768,
                num_hidden_layers=12,
                num_attention_heads=12,
                intermediate_size=3072,
                feat_extract_norm="group",
                conv_bias=False,
                do_stable_layer_norm=False,
                hidden_dropout=0.0,
                attention_dropout=0.0,
                feat_proj_dropout=0.0,
                activation_dropout=0.0,
                layerdrop=0.0,
                apply_spec_augment=False,
            )
        )
        # temper the conv stack (std-1 kernels through 7 unnormed convs
        # saturate downstream softmaxes) — SAME weights on both sides
        hsd = hf_hubert.state_dict()
        for k in hsd:
            if "conv_layers" in k and k.endswith("weight") and "layer_norm" not in k:
                hsd[k] = hsd[k] * 0.1
        hf_hubert.load_state_dict(hsd)
        hf_hubert.eval()

        hf_clip = CLIPModel(
            CLIPConfig.from_text_vision_configs(
                CLIPTextConfig(
                    vocab_size=49408,
                    hidden_size=512,
                    intermediate_size=2048,
                    num_hidden_layers=12,
                    num_attention_heads=8,
                    max_position_embeddings=77,
                    hidden_act="quick_gelu",
                    eos_token_id=49407,
                    bos_token_id=49406,
                ),
                CLIPVisionConfig(
                    image_size=224,
                    patch_size=32,
                    hidden_size=768,
                    intermediate_size=3072,
                    num_hidden_layers=12,
                    num_attention_heads=12,
                    hidden_act="quick_gelu",
                ),
                projection_dim=512,
            )
        )
        hf_clip.eval()

        # config with the REAL shipped table; its ids reduce the HF text
        # embedding exactly like the reference training run did
        import os

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        table = os.path.join(
            repo, "assets", "flickr_stat", "text_clip_vocab_usage_byfreq.npy"
        )
        selected_ids = np.load(table)[:, 0]

        from __graft_entry__ import _flagship_config

        cfg = _flagship_config()
        cfg.clip.reduce_subword_embbedding = table
        cfg.trainer.precision = 32

        # --- build the reference-named checkpoint from the SAME weights ---
        sd = {}
        for k, v in fairseq_sd_from_hf_hubert(hf_hubert).items():
            sd[f"audio_encoder.encoder.{k}"] = v
        ws_weights = torch.randn(13)
        sd["audio_encoder.weightedsum_layer.weights"] = ws_weights
        for k, v in openai_sd_from_hf_clip(hf_clip, selected_ids).items():
            sd[f"clip.model.{k}"] = v

        p_enc = torch_ref.make_torch_encoder(
            n_layers=1, d_model=d, nhead=8, dim_feedforward=3072
        )
        p_lin = torch.nn.Linear(d, out_dim)
        p_cls = torch.randn(1, 1, d)
        sd["parallel_branch.cls"] = p_cls
        for k, v in p_enc.state_dict().items():
            sd[f"parallel_branch.self_att.model.{k}"] = v
        for k, v in p_lin.state_dict().items():
            sd[f"parallel_branch.linear_proj.{k}"] = v

        c_mha, c_norm = torch_ref.make_torch_mha_and_norm(d_model=d, nhead=1)
        c_lin = torch.nn.Linear(d, out_dim)
        c_bn = torch.nn.BatchNorm1d(out_dim * K)
        c_bn.running_mean.normal_()
        c_bn.running_var.uniform_(0.5, 2.0)
        c_cls = torch.randn(1, K, d)
        sd["cascaded_branch.cls"] = c_cls
        for k, v in c_mha.state_dict().items():
            sd[f"cascaded_branch.self_att.multihead_attn_layer.{k}"] = v
        for k, v in c_norm.state_dict().items():
            sd[f"cascaded_branch.self_att.attentionBlock_Norm.{k}"] = v
        for k, v in c_lin.state_dict().items():
            sd[f"cascaded_branch.linear_proj.{k}"] = v
        for k, v in c_bn.state_dict().items():
            sd[f"cascaded_branch.bn_layer.bn_layer.{k}"] = v
        sd["cascaded_branch.vector_quantizer.curr_temp"] = torch.tensor([0.1])

        ckpt = {"state_dict": sd, "hyper_parameters": {"config": cfg.to_dict()}}
        params, state, _ = convert_reference_checkpoint(ckpt, cfg)
        model = SpeechCLIPModel(cfg)
        assert model.sot_id == 2 and model.eot_id == 3  # shipped-table rows

        # --- inputs: equal-length wavs (mask-free oracle) + 3 images ---
        B = 6
        rng = np.random.default_rng(11)
        wav = rng.standard_normal((B, 32000)).astype(np.float32)
        images = rng.standard_normal((3, 3, 224, 224)).astype(np.float32)

        # --- torch composite forward (the reference chain) ---
        with torch.no_grad():
            hub = hf_hubert(torch.tensor(wav), output_hidden_states=True)
            states = torch.stack(hub.hidden_states)  # (13, B, T, 768)
            w = torch.softmax(ws_weights, dim=0)
            feat = (w[:, None, None, None] * states).sum(0)

            # parallel branch (kwClip.py:1101-1106)
            p_enc.eval()
            src = torch.cat([p_cls.expand(B, 1, d), feat], dim=1)
            par_t = p_lin(p_enc(src)[:, 0])
            par_t = F.normalize(par_t, dim=-1)

            # cascaded branch (kwClip.py:856-916)
            c_mha.eval()
            c_bn.eval()
            src = torch.cat([c_cls.expand(B, K, d), feat], dim=1)
            attn, _ = c_mha(src, src, src)
            kw = c_norm(attn + src)[:, :K]
            kw = c_lin(kw)
            # kw-BN eachKw/parallel eval (kw_bn.py:115-124)
            x = kw.permute(0, 2, 1).reshape(B, -1)
            x = c_bn(x).reshape(B, out_dim, K).permute(0, 2, 1)
            # per-keyword cosine vs the reduced table (kwClip.py:889-900)
            emb = hf_clip.text_model.embeddings.token_embedding.weight[
                torch.as_tensor(selected_ids)
            ]
            cos = torch.stack(
                [
                    F.cosine_similarity(
                        x[:, i, :].view(B, out_dim, 1),
                        emb.T.unsqueeze(0),
                        dim=1,
                    )
                    for i in range(K)
                ],
                dim=1,
            )  # (B, K, V)
            # eval VQ: mask pad/SOT/EOT rows, hard one-hot
            # (my_vector_quantizer.py:78-91, :139)
            cosm = cos.clone()
            cosm[..., [0, 2, 3]] += float("-inf")
            targets_t = cosm.argmax(-1)  # (B, K)
            keywords_t = emb[targets_t]  # (B, K, 512)
            # tie-margin precondition: comparing argmax across frameworks is
            # only meaningful when top-1 has daylight over top-2
            top2 = cosm.topk(2, dim=-1).values
            assert float((top2[..., 0] - top2[..., 1]).min()) > 2e-3

            # encode_keywords (clip_official.py:220-264): 77-token buffer
            text = torch.zeros(B, 77, dtype=torch.long)
            text[:, 0] = 2  # reduced SOT
            text[:, K + 1] = 3  # reduced EOT
            xemb = emb[text]
            xemb[:, 1 : 1 + K] = keywords_t
            tow = torch_clip_text_tower(hf_clip, xemb)
            casc_t = tow[:, 1 + K] @ hf_clip.text_projection.weight.T
            casc_t = F.normalize(casc_t, dim=-1)

            img_t = hf_clip.get_image_features(pixel_values=torch.tensor(images))
            img_t = F.normalize(img_t, dim=-1)

        # --- JAX side: converted params through the public encode APIs ---
        out = model.encode_speech(
            params,
            state,
            jnp.asarray(wav),
            jnp.asarray(np.full((B,), 32000, np.int32)),
        )
        img_j = model.forward_image(params, jnp.asarray(images.transpose(0, 2, 3, 1)))
        img_j = np.asarray(img_j / np.linalg.norm(np.asarray(img_j), axis=-1, keepdims=True))

        # the VQ picked the same subwords (exact integer equality)
        np.testing.assert_array_equal(
            np.asarray(out["vq_results"]["targets"])[..., 0], targets_t.numpy()
        )
        np.testing.assert_allclose(
            np.asarray(out["keywords"]), keywords_t.numpy(), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["parallel_audio_feat"]), par_t.numpy(), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["cascaded_audio_feat"]), casc_t.numpy(), atol=5e-3
        )
        np.testing.assert_allclose(img_j, img_t.numpy(), atol=5e-3)

        # retrieval on both feature sets must agree exactly (rank margins
        # far above the 5e-3 feature tolerance at 3-image gallery scale)
        from speechclip_tpu.training.evaluation import (
            collect_validation_outputs,
            retrieval_metrics,
        )

        ids = np.array([0, 0, 1, 1, 2, 2])
        recalls = {}
        for tag, a_feat, i_feat in (
            ("jax", np.asarray(out["parallel_audio_feat"]), img_j),
            ("torch", par_t.numpy(), img_t.numpy()),
        ):
            collected = collect_validation_outputs(
                [{"id": ids, "audio_feat": a_feat, "image_feat": i_feat[ids]}]
            )
            _, _, r_mean = retrieval_metrics(collected, [1, 5])
            recalls[tag] = r_mean
        assert recalls["jax"] == recalls["torch"]


class TestFullModelTorchOracleLarge:
    """The LARGE family composite oracle (4 of the 6 released checkpoints:
    large flickr/coco x parallel/cascaded): pre-norm HuBERT-large (layer-
    norm conv extractor with biases, in-model waveform normalization,
    RAW final layer state — the reference's custom fairseq forward applies
    no post-loop norm), s3prl-style per-state layer_norm before the
    weighted sum (normalize_hiddenstates), ViT-L/14 towers (768-d joint
    space), and the REAL shipped SpokenCOCO reduced-vocab table (19787
    rows). Same end-to-end chain as TestFullModelTorchOracle."""

    K = 8

    def test_composite_forward_matches_large_coco(self, tmp_path):
        import os

        import torch.nn.functional as F
        from transformers import (
            CLIPConfig,
            CLIPModel,
            CLIPTextConfig,
            CLIPVisionConfig,
            HubertConfig,
            HubertModel,
        )

        from speechclip_tpu.convert.reference_ckpt import (
            convert_reference_checkpoint,
        )
        from speechclip_tpu.models.speechclip import SpeechCLIPModel
        from tests import torch_ref

        torch.manual_seed(5)
        d, out_dim, K = 1024, 768, self.K

        hf_hubert = HubertModel(
            HubertConfig(
                hidden_size=1024,
                num_hidden_layers=24,
                num_attention_heads=16,
                intermediate_size=4096,
                feat_extract_norm="layer",
                conv_bias=True,
                do_stable_layer_norm=True,
                hidden_dropout=0.0,
                attention_dropout=0.0,
                feat_proj_dropout=0.0,
                activation_dropout=0.0,
                layerdrop=0.0,
                apply_spec_augment=False,
            )
        )
        hf_hubert.eval()

        hf_clip = CLIPModel(
            CLIPConfig.from_text_vision_configs(
                CLIPTextConfig(
                    vocab_size=49408,
                    hidden_size=768,
                    intermediate_size=3072,
                    num_hidden_layers=12,
                    num_attention_heads=12,
                    max_position_embeddings=77,
                    hidden_act="quick_gelu",
                    eos_token_id=49407,
                    bos_token_id=49406,
                ),
                CLIPVisionConfig(
                    image_size=224,
                    patch_size=14,
                    hidden_size=1024,
                    intermediate_size=4096,
                    num_hidden_layers=24,
                    num_attention_heads=16,
                    hidden_act="quick_gelu",
                ),
                projection_dim=768,
            )
        )
        hf_clip.eval()

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        table = os.path.join(
            repo, "assets", "coco_stat", "text_clip_vocab_usage_byfreq.npy"
        )
        selected_ids = np.load(table)[:, 0]

        from __graft_entry__ import _flagship_config

        cfg = _flagship_config()
        cfg.clip.name = "ViT-L/14"
        cfg.clip.reduce_subword_embbedding = table
        cfg.audio_encoder.name = "hubert_large_ll60k"
        cfg.audio_encoder.normalize_hiddenstates = True
        cfg.audio_encoder.normalize_type = "s3prl"
        for branch in ("parallel_branch", "cascaded_branch"):
            cfg.model_settings[branch].transformer_args.d_model = d
            cfg.model_settings[branch].transformer_args.dim_feedforward = 4096
        cfg.trainer.precision = 32

        # --- reference-named checkpoint from the SAME weights ---
        sd = {}
        for k, v in fairseq_sd_from_hf_hubert(hf_hubert).items():
            sd[f"audio_encoder.encoder.{k}"] = v
        ws_weights = torch.randn(25)
        sd["audio_encoder.weightedsum_layer.weights"] = ws_weights
        for k, v in openai_sd_from_hf_clip(hf_clip, selected_ids).items():
            sd[f"clip.model.{k}"] = v

        p_enc = torch_ref.make_torch_encoder(
            n_layers=1, d_model=d, nhead=8, dim_feedforward=4096
        )
        p_lin = torch.nn.Linear(d, out_dim)
        p_cls = torch.randn(1, 1, d)
        sd["parallel_branch.cls"] = p_cls
        for k, v in p_enc.state_dict().items():
            sd[f"parallel_branch.self_att.model.{k}"] = v
        for k, v in p_lin.state_dict().items():
            sd[f"parallel_branch.linear_proj.{k}"] = v

        c_mha, c_norm = torch_ref.make_torch_mha_and_norm(d_model=d, nhead=1)
        c_lin = torch.nn.Linear(d, out_dim)
        c_bn = torch.nn.BatchNorm1d(out_dim * K)
        c_bn.running_mean.normal_()
        c_bn.running_var.uniform_(0.5, 2.0)
        c_cls = torch.randn(1, K, d)
        sd["cascaded_branch.cls"] = c_cls
        for k, v in c_mha.state_dict().items():
            sd[f"cascaded_branch.self_att.multihead_attn_layer.{k}"] = v
        for k, v in c_norm.state_dict().items():
            sd[f"cascaded_branch.self_att.attentionBlock_Norm.{k}"] = v
        for k, v in c_lin.state_dict().items():
            sd[f"cascaded_branch.linear_proj.{k}"] = v
        for k, v in c_bn.state_dict().items():
            sd[f"cascaded_branch.bn_layer.bn_layer.{k}"] = v
        sd["cascaded_branch.vector_quantizer.curr_temp"] = torch.tensor([0.1])

        ckpt = {"state_dict": sd, "hyper_parameters": {"config": cfg.to_dict()}}
        params, state, _ = convert_reference_checkpoint(ckpt, cfg)
        model = SpeechCLIPModel(cfg)
        assert model.sot_id == 2 and model.eot_id == 3  # shipped COCO rows
        assert model.audio_cfg.encoder_layers == 24
        assert model.audio_cfg.normalize_waveform

        B = 4
        rng = np.random.default_rng(17)
        wav = rng.standard_normal((B, 32000)).astype(np.float32)
        images = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)

        # --- torch composite (reference chain, large semantics) ---
        with torch.no_grad():
            # in-model waveform normalization -> HF gets the host equivalent
            normed = (wav - wav.mean(axis=1, keepdims=True)) / np.sqrt(
                wav.var(axis=1, keepdims=True) + 1e-5
            )
            # the reference's fairseq forward keeps the LAST state RAW
            # (no post-loop encoder.layer_norm); HF's final hidden_states
            # entry is post-norm — capture the raw last-layer output
            captured = {}
            hook = hf_hubert.encoder.layers[-1].register_forward_hook(
                lambda m, i, o: captured.__setitem__("raw", o[0])
            )
            hub = hf_hubert(torch.tensor(normed), output_hidden_states=True)
            hook.remove()
            # consistency: norm(raw last) must BE HF's last hidden state
            np.testing.assert_allclose(
                hf_hubert.encoder.layer_norm(captured["raw"]).numpy(),
                hub.hidden_states[24].numpy(),
                atol=1e-5,
            )
            states = torch.stack(
                list(hub.hidden_states[:24]) + [captured["raw"]]
            )  # (25, B, T, 1024)
            # normalize_hiddenstates (s3prl featurizer): per-state LN
            states = F.layer_norm(states, (d,))
            w = torch.softmax(ws_weights, dim=0)
            feat = (w[:, None, None, None] * states).sum(0)

            p_enc.eval()
            src = torch.cat([p_cls.expand(B, 1, d), feat], dim=1)
            par_t = F.normalize(p_lin(p_enc(src)[:, 0]), dim=-1)

            c_mha.eval()
            c_bn.eval()
            src = torch.cat([c_cls.expand(B, K, d), feat], dim=1)
            attn, _ = c_mha(src, src, src)
            kw = c_lin(c_norm(attn + src)[:, :K])
            x = kw.permute(0, 2, 1).reshape(B, -1)
            x = c_bn(x).reshape(B, out_dim, K).permute(0, 2, 1)
            emb = hf_clip.text_model.embeddings.token_embedding.weight[
                torch.as_tensor(selected_ids)
            ]
            cos = torch.stack(
                [
                    F.cosine_similarity(
                        x[:, i, :].view(B, out_dim, 1),
                        emb.T.unsqueeze(0),
                        dim=1,
                    )
                    for i in range(K)
                ],
                dim=1,
            )
            cosm = cos.clone()
            cosm[..., [0, 2, 3]] += float("-inf")
            targets_t = cosm.argmax(-1)
            top2 = cosm.topk(2, dim=-1).values
            margins = (top2[..., 0] - top2[..., 1]).numpy()

        # --- JAX side (raw wav in; the model normalizes) ---
        out = model.encode_speech(
            params,
            state,
            jnp.asarray(wav),
            jnp.asarray(np.full((B,), 32000, np.int32)),
        )
        img_j = np.asarray(
            model.forward_image(params, jnp.asarray(images.transpose(0, 2, 3, 1)))
        )
        img_j = img_j / np.linalg.norm(img_j, axis=-1, keepdims=True)

        # VQ target agreement on DETERMINATE positions. At 768-d cosine
        # over 19787 candidates the top-2 gap distribution is tight (min
        # over B*K positions measured ~1e-4..2e-3 across seeds) — demanding
        # exact argmax agreement everywhere would compare framework noise,
        # not correctness. Positions with torch-side margin > 3e-3 must
        # match exactly; near-ties must be few. (The base-dims oracle
        # asserts FULL equality — margins are comfortable there.)
        targets_j = np.asarray(out["vq_results"]["targets"])[..., 0]
        determinate = margins > 3e-3
        assert determinate.mean() > 0.6, f"too many near-ties: {margins}"
        np.testing.assert_array_equal(
            targets_j[determinate], targets_t.numpy()[determinate]
        )

        # post-VQ chain oracle on the AGREED targets: feed torch the JAX
        # selections so keyword/text-tower/feature comparisons stay exact
        # regardless of near-tie flips
        with torch.no_grad():
            keywords_t = emb[torch.as_tensor(targets_j)]
            text = torch.zeros(B, 77, dtype=torch.long)
            text[:, 0] = 2
            text[:, K + 1] = 3
            xemb = emb[text]
            xemb[:, 1 : 1 + K] = keywords_t
            tow = torch_clip_text_tower(hf_clip, xemb)
            casc_t = F.normalize(
                tow[:, 1 + K] @ hf_clip.text_projection.weight.T, dim=-1
            )
            img_t = F.normalize(
                hf_clip.get_image_features(pixel_values=torch.tensor(images)),
                dim=-1,
            )

        np.testing.assert_allclose(
            np.asarray(out["keywords"]), keywords_t.numpy(), atol=8e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["parallel_audio_feat"]), par_t.numpy(), atol=8e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["cascaded_audio_feat"]), casc_t.numpy(), atol=8e-3
        )
        np.testing.assert_allclose(img_j, img_t.numpy(), atol=8e-3)
