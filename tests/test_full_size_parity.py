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
