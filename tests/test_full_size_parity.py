"""Full-size architecture parity: real HuBERT-base / CLIP ViT-B/32 dims vs
randomly-initialized HuggingFace torch models. Slower than the tiny tests
but exercises the production shapes (768-d, 12 layers, pos_conv groups=16,
7-conv frontend, 224px/32px patches)."""

import numpy as np
import pytest
import torch

import jax
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
        from __graft_entry__ import _flagship_config

        # synthetic byfreq table with the shipped layout: rows 0/2/3 are
        # pad/SOT/EOT (reference flickr_stat tables; VQ prob_msk semantics)
        rng = np.random.default_rng(5)
        others = rng.choice(
            np.arange(1, 49406), size=self.REDUCED_V - 3, replace=False
        )
        ids = np.concatenate([[0, others[0], 49406, 49407], others[1:]])
        freq = np.arange(len(ids), 0, -1)
        npy = tmp_path / "vocab_byfreq.npy"
        np.save(npy, np.stack([ids, freq], axis=1).astype(np.int64))

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
