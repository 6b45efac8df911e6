"""Host-side CLIP convenience wrapper.

API parity with the reference ClipModel (avssl/module/clip_official.py:26-294)
for users who drive CLIP directly: prep_image (paths -> batched pixels),
prep_text (sentences -> [reduced] token ids + EOT positions), deTokenize,
encode_image/encode_text/encode_keywords, get_scores. The heavy math stays
in the pure functions of models/clip.py; this object only holds params and
host-side id maps.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

import jax.numpy as jnp

from . import clip as clip_mod
from .tokenizer import CLIPTokenizer


class ClipWrapper:
    def __init__(
        self,
        name: str = "ViT-B/32",
        params=None,
        reduce_subword_embbedding: Optional[str] = None,
        pretrained_path: Optional[str] = None,
        tokenizer: Optional[CLIPTokenizer] = None,
        image_encoder_trainable: bool = False,
        text_encoder_trainable: bool = False,
        **kwargs,
    ):
        import jax

        self.name = name
        self.cfg = clip_mod.NAMED_CONFIGS[name]
        self.image_encoder_trainable = image_encoder_trainable
        self.text_encoder_trainable = text_encoder_trainable
        self.tokenizer = tokenizer

        if params is None:
            if pretrained_path:
                from ..convert.from_torch import load_clip_checkpoint

                params = load_clip_checkpoint(pretrained_path, self.cfg)
            else:
                params = clip_mod.clip_init(jax.random.key(0), self.cfg)

        self.reduced_vocab = None
        if reduce_subword_embbedding:
            self.reduced_vocab = clip_mod.load_reduced_vocab(
                reduce_subword_embbedding
            )
            if params["text"]["token_embedding"].shape[0] == self.cfg.text.vocab_size:
                params = clip_mod.reduce_token_embedding(params, self.reduced_vocab)
        self.params = params

        full_sot = self.cfg.text.vocab_size - 2
        full_eot = self.cfg.text.vocab_size - 1
        if self.reduced_vocab is not None:
            self.sot_id = self.reduced_vocab.original_to_reduced[full_sot]
            self.eot_id = self.reduced_vocab.original_to_reduced[full_eot]
        else:
            self.sot_id, self.eot_id = full_sot, full_eot

    @property
    def out_dim(self) -> int:
        return self.cfg.text.width

    # ------------------------------------------------------------- host prep
    def prep_image(self, paths: Sequence[str]) -> jnp.ndarray:
        """(reference :151-164) -> (B, H, W, 3) normalized f32."""
        from ..data.image import load_image

        return jnp.asarray(
            np.stack(
                [load_image(p, self.cfg.vision.image_size) for p in paths]
            )
        )

    def prep_text(self, sents: Sequence[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(reference :166-180) -> (ids (B, 77), eot_positions (B,)); ids are
        reduced when a reduced vocabulary is active."""
        assert self.tokenizer is not None, "prep_text needs a tokenizer"
        ids = self.tokenizer.tokenize(list(sents))
        eot_positions = np.argmax(ids == self.tokenizer.eot_id, axis=1)
        if self.reduced_vocab is not None:
            ids = self.reduced_vocab.map_original(ids)
        return jnp.asarray(ids), jnp.asarray(eot_positions)

    def deTokenize(self, ids: Union[np.ndarray, jnp.ndarray, list]) -> List[str]:
        """(reference :182-198)"""
        assert self.tokenizer is not None
        arr = np.asarray(ids)
        if arr.ndim == 1:
            arr = arr[None]
        out = []
        for row in arr:
            row = [int(i) for i in row]
            if self.reduced_vocab is not None:
                row = [self.reduced_vocab.reduced_to_original[i] for i in row]
            text = (
                self.tokenizer.decode(row)
                .replace("<|startoftext|>", "")
                .replace("<|endoftext|>", "")
                .strip()
            )
            out.append(text)
        return out

    # ---------------------------------------------------------------- encode
    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        return clip_mod.encode_image(self.params, self.cfg, images)

    def encode_text(
        self, text: jnp.ndarray, eot_positions: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return clip_mod.encode_text(self.params, self.cfg, text, eot_positions)

    def encode_keywords(
        self, keywords: jnp.ndarray, keyword_num: int
    ) -> jnp.ndarray:
        assert keywords.shape[1] == keyword_num
        return clip_mod.encode_keywords(
            self.params, self.cfg, keywords, self.sot_id, self.eot_id
        )

    def get_scores(
        self,
        images: jnp.ndarray,
        text: jnp.ndarray,
        eot_positions: Optional[jnp.ndarray] = None,
    ):
        return clip_mod.get_scores(
            self.params, self.cfg, images, text, eot_positions
        )
