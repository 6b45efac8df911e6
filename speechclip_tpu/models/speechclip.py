"""The SpeechCLIP model: HuBERT x frozen CLIP with parallel/cascaded heads.

TPU-native equivalent of the reference KWClipBase /
KWClip_GeneralTransformer (avssl/model/kwClip.py:49-694, :1111-1496). The
torch Lightning module becomes a host-side description object
(``SpeechCLIPModel``) plus pure functions over (params, state) pytrees:

  init(rng)                        -> (params, state)
  forward(params, state, batch)    -> (loss_feats, log_metrics, others, state')
  compute_loss(params, loss_feats) -> losses dict
  encode_speech(params, state, wav, wav_len)          (reference :1299-1383)
  extract_hidden_states(...)       == feature_extractor_s3prl (:1214-1246)
  get_attention_weights(...)       (:1480-1496)

Static shapes: the data pipeline buckets waveforms; T = bucket_len/320
frames. Mixed precision: params stay f32, activations run in the configured
compute dtype (bf16 on TPU), feature normalization and the loss in f32.

The contrastive loss is written as global-batch math; under pjit with
batch-sharded inputs XLA inserts the cross-chip all-gathers so negatives
span the pod slice (replaces the reference's DP training_step_end gather,
kwClip.py:147-191).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode
from ..ops.basic import Params, l2_normalize
from ..ops.losses import (
    contrastive_temp_init,
    contrastive_temperature,
    masked_contrastive_loss,
)
from ..ops.mlp import mlp_apply, mlp_init
from ..ops.weighted_sum import weighted_sum_apply, weighted_sum_init
from . import branches, clip as clip_mod, hubert

WEIGHTED_SUM_MODE = "weighted_sum"


def _compute_dtype(config: ConfigNode):
    precision = config.get_path("trainer.precision", 32)
    if str(precision) in ("16", "bf16", "bfloat16"):
        return jnp.bfloat16
    return jnp.float32


def resolve_audio_upstream(config: ConfigNode):
    """None for the hubert family (native fairseq-contract implementation);
    an upstream.Upstream handle when audio_encoder.type is s3prl_plus with a
    registered non-HuBERT name (reference S3prlSpeechEncoderPlus drives any
    s3prl hub model, speech_encoder_plus.py:110-316)."""
    if config.audio_encoder.type != "s3prl_plus":
        return None
    from .upstream import resolve_upstream

    overrides = config.audio_encoder.get("upstream_args")
    return resolve_upstream(
        config.audio_encoder.name,
        overrides.to_dict() if overrides is not None else None,
    )


_UNRESOLVED = object()


def _resolve_clip_cfg(config: ConfigNode):
    custom_clip = config.clip.get("custom")
    if custom_clip is not None:
        vision = dict(custom_clip.vision.to_dict())
        arch = vision.pop("arch", None)
        if arch == "resnet" or isinstance(vision.get("layers"), (list, tuple)):
            # RN* family: per-stage block counts come as a list (absent ->
            # the dataclass's RN50 default stages)
            if "layers" in vision:
                vision["layers"] = tuple(vision["layers"])
            vision_cfg = clip_mod.CLIPResNetVisionConfig(**vision)
        else:
            vision_cfg = clip_mod.CLIPVisionConfig(**vision)
        return clip_mod.CLIPConfig(
            vision=vision_cfg,
            text=clip_mod.CLIPTextConfig(**custom_clip.text.to_dict()),
        )
    return clip_mod.NAMED_CONFIGS[config.clip.name]


def resolve_tower_configs(config: ConfigNode, upstream=_UNRESOLVED):
    """(audio_cfg, CLIPConfig) from the config block: named presets, or
    custom dims via audio_encoder.custom / clip.custom. audio_cfg is a
    HubertConfig for the hubert family, or the generic upstream's config
    (same encoder_embed_dim / num_hidden_states / downsample_rate surface)
    for registered s3prl_plus names. Pass an already-resolved ``upstream``
    (or None for the hubert family) to avoid re-resolving."""
    if upstream is _UNRESOLVED:
        upstream = resolve_audio_upstream(config)
    if upstream is not None:
        return upstream.cfg, _resolve_clip_cfg(config)
    custom_ae = config.audio_encoder.get("custom")
    if custom_ae is not None:
        kwargs = dict(custom_ae.to_dict())
        if "conv_layers" in kwargs:
            kwargs["conv_layers"] = tuple(tuple(l) for l in kwargs["conv_layers"])
        audio_cfg = hubert.HubertConfig(**kwargs)
    else:
        audio_cfg = hubert.NAMED_CONFIGS[config.audio_encoder.name]
    conv_chunk = config.audio_encoder.get("conv_batch_chunk")
    if conv_chunk is not None:
        audio_cfg = dataclasses.replace(audio_cfg, conv_batch_chunk=int(conv_chunk))
    remat = config.audio_encoder.get("remat")
    if remat is not None:
        audio_cfg = dataclasses.replace(audio_cfg, remat=bool(remat))
    return audio_cfg, _resolve_clip_cfg(config)


def _resolve_asset_path(path: str) -> str:
    """Resolve config-relative asset paths (e.g. the shipped
    ``assets/{flickr,coco}_stat/*.npy`` reduced-vocab tables) against the
    repo root when they don't exist relative to the CWD, so the six shipped
    configs construct from a fresh checkout regardless of invocation
    directory (reference configs use repo-relative paths the same way,
    config/.../spchclp_p.yaml:94).

    Also remaps reference-style table paths (``.../{flickr,coco}_stat/*.npy``
    as pickled into RELEASED checkpoints' configs, config/.../spchclp_*.yaml:94)
    to the vendored byte-identical copies under ``assets/`` when the original
    location does not exist here — covers both checkpoint conversion and
    hand-written configs pointing at the reference layout."""
    import os
    import re

    if os.path.exists(path):
        return path
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if not os.path.isabs(path):
        candidate = os.path.join(repo_root, path)
        if os.path.exists(candidate):
            return candidate
    m = re.search(r"(flickr|coco)_stat/([\w.]+\.npy)$", path)
    if m:
        vendored = os.path.join(
            repo_root, "assets", f"{m.group(1)}_stat", m.group(2)
        )
        if os.path.exists(vendored):
            return vendored
    return path


@dataclasses.dataclass
class SpeechCLIPModel:
    """Host-side model description; all heavy math lives in pure methods."""

    config: ConfigNode

    def __post_init__(self):
        cfg = self.config
        ae_type = cfg.audio_encoder.type
        if ae_type not in ("FairseqHubert", "s3prl_plus"):
            raise NotImplementedError(f"audio encoder type {ae_type}")
        # generic s3prl upstream (None -> in-repo HuBERT fairseq contract)
        self.upstream = resolve_audio_upstream(cfg)
        self.audio_cfg, self.clip_cfg = resolve_tower_configs(
            cfg, upstream=self.upstream
        )
        if cfg.audio_encoder.get("normalize_hiddenstates", False):
            self.hidden_norm_type = cfg.audio_encoder.get("normalize_type", "s3prl")
        else:
            self.hidden_norm_type = None
        if cfg.audio_encoder.get("wsum_remat", False):
            # the knob exists to avoid the large model's b256 OOM; if a gate
            # condition statically rules the memory path out, the user gets
            # the OOM they configured the knob to avoid — say so ONCE here
            # instead of silently no-opping (ADVICE r4). The per-call
            # return_hidden_states fall-through is not flagged: extracting
            # hidden states requires materializing them by definition.
            blockers = []
            if cfg.audio_encoder.feat_select_idx != WEIGHTED_SUM_MODE:
                blockers.append(
                    f"feat_select_idx={cfg.audio_encoder.feat_select_idx!r}"
                    " (needs 'weighted_sum')"
                )
            if self.upstream is not None:
                blockers.append("a custom s3prl upstream is configured")
            if cfg.audio_encoder.get("trainable", False):
                blockers.append(
                    "audio_encoder.trainable=true (the backward recompute"
                    " assumes a frozen, deterministic encoder)"
                )
            if blockers:
                import logging

                logging.getLogger(__name__).warning(
                    "audio_encoder.wsum_remat is set but will NOT engage: "
                    "%s — the N-hidden-state stack stays live and large "
                    "batches may OOM (see models/hubert.py "
                    "hubert_frozen_weighted_sum)",
                    "; ".join(blockers),
                )
        self.audio_embd_dim = self.audio_cfg.encoder_embed_dim
        self.subword_embd_dim = self.clip_cfg.text.width
        self.compute_dtype = _compute_dtype(cfg)
        _reinit = list(cfg.audio_encoder.get("reinit_layers", []) or [])
        _unfreeze = list(cfg.audio_encoder.get("unfreeze_layers", []) or [])
        if (_reinit or _unfreeze) and not cfg.audio_encoder.get(
            "trainable", False
        ):
            # the reference crashes on this (`assert self.trainable`,
            # speech_encoder_plus.py:172/186); silently proceeding would
            # train the whole run against frozen re-randomized layers
            # (reinit) or freeze everything anyway (unfreeze)
            raise ValueError(
                "audio_encoder.reinit_layers/unfreeze_layers require "
                "audio_encoder.trainable: true — otherwise the selected "
                "layers would stay frozen (reinit would leave frozen RANDOM "
                "layers in the encoder)"
            )
        if isinstance(
            self.clip_cfg.vision, clip_mod.CLIPResNetVisionConfig
        ) and cfg.clip.get("image_encoder_trainable", False):
            # the RN towers' BatchNorm is implemented with inference
            # semantics (running stats) — matching every shipped/released
            # configuration, where the CLIP image tower is frozen
            # (clip_official.py:111-132). Training it would need batch-stat
            # BN + running-stat state threading; refuse loudly.
            raise NotImplementedError(
                "image_encoder_trainable is not supported for the RN* CLIP "
                "towers (inference-mode BatchNorm); use a ViT tower or "
                "freeze the image encoder"
            )

        self.reduced_vocab = None
        reduce_path = cfg.clip.get("reduce_subword_embbedding")
        if reduce_path:
            self.reduced_vocab = clip_mod.load_reduced_vocab(
                _resolve_asset_path(reduce_path)
            )
        # CLIP vocab convention: SOT/EOT are the last two ids
        full_sot = self.clip_cfg.text.vocab_size - 2
        full_eot = self.clip_cfg.text.vocab_size - 1
        if self.reduced_vocab is not None:
            self.sot_id = self.reduced_vocab.original_to_reduced[full_sot]
            self.eot_id = self.reduced_vocab.original_to_reduced[full_eot]
        else:
            self.sot_id, self.eot_id = full_sot, full_eot

        ms = cfg.model_settings
        self.use_cascaded = ms.get("cascaded_objective_weight", 0.0) > 0
        self.use_parallel = ms.get("parallel_objective_weight", 0.0) > 0
        self.keyword_num = cfg.get_path(
            "model_settings.cascaded_branch.keyword.number", 8
        )
        self.recall_at = cfg.get_path("retrieval.recall_at", [1, 5, 10])

        cl = cfg.cl_loss
        self.loss_type = cl.type
        if cl.type == "MaskedContrastiveLoss":
            self.loss_kwargs = dict(
                temperature=cl.args.get("temperature", 0.07),
                temperature_trainable=cl.args.get("temperature_trainable", False),
                margin=cl.args.get("margin", 0.0),
                dcl=cl.args.get("dcl", False),
                a2b=cl.args.get("a2b", True),
                b2a=cl.args.get("b2a", True),
            )
        elif cl.type == "SupConLoss":
            # the reference exports SupConLoss but its KWClip compute_loss
            # only speaks the masked-loss signature (kwClip.py:1276-1295 —
            # selecting SupConLoss there would crash); here it is wired as
            # (audio, image) two-view supervised contrast with pair-id labels
            self.loss_kwargs = dict(
                temperature=cl.args.get("temperature", 0.07),
                temperature_trainable=cl.args.get(
                    "learnable_temperature", cl.args.get("temperature_trainable", False)
                ),
                base_temperature=cl.args.get("base_temperature", 0.07),
                contrast_mode=cl.args.get("contrast_mode", "all"),
            )
        else:
            raise NotImplementedError(f"cl_loss type {cl.type}")

    # ------------------------------------------------------------------ init
    def init(self, rng: jax.Array) -> Tuple[Params, Params]:
        cfg = self.config
        keys = jax.random.split(rng, 8)
        if self.loss_type == "MaskedContrastiveLoss":
            criterion = contrastive_temp_init(
                self.loss_kwargs["temperature"],
                self.loss_kwargs["temperature_trainable"],
            )
        else:  # SupConLoss: direct temperature parameter (losses.py:26-34)
            criterion = (
                {"temp": jnp.asarray(self.loss_kwargs["temperature"], jnp.float32)}
                if self.loss_kwargs["temperature_trainable"]
                else {}
            )
        params: Params = {
            "audio_encoder": (
                self.upstream.init(keys[0])
                if self.upstream is not None
                else hubert.hubert_init(keys[0], self.audio_cfg)
            ),
            "clip": clip_mod.clip_init(keys[1], self.clip_cfg),
            "criterion": criterion,
        }
        state: Params = {}
        if self.reduced_vocab is not None:
            params["clip"] = clip_mod.reduce_token_embedding(
                params["clip"], self.reduced_vocab
            )
        if cfg.audio_encoder.feat_select_idx == WEIGHTED_SUM_MODE:
            params["weighted_sum"] = weighted_sum_init(
                self.audio_cfg.num_hidden_states
            )
        if self.use_cascaded:
            c_params, c_state = branches.cascaded_branch_init(
                keys[2],
                cfg.model_settings.cascaded_branch,
                self.audio_embd_dim,
                self.subword_embd_dim,
                params["clip"]["text"]["token_embedding"],
            )
            params["cascaded_branch"] = c_params
            if c_state:
                state["cascaded_branch"] = c_state
        if self.use_parallel:
            params["parallel_branch"] = branches.parallel_branch_init(
                keys[3],
                cfg.model_settings.parallel_branch,
                self.audio_embd_dim,
                self.clip_cfg.embed_dim,
            )
        for (key, cfg_key), proj_rng in zip(
            [
                ("img_enc_proj", "image_encoder_projection"),
                ("p_branch_proj", "parallel_branch_projection"),
                ("c_branch_proj", "cascaded_branch_projection"),
            ],
            keys[4:7],
        ):
            proj_cfg = cfg.model_settings.get(cfg_key)
            if proj_cfg is not None:
                params[key] = mlp_init(proj_rng, proj_cfg.dimensions)
        return params, state

    def load_pretrained(self, params: Params) -> Params:
        """Swap the randomly-initialized frozen towers for converted
        pretrained weights when checkpoint files are configured
        (audio_encoder.pretrained_path / clip.pretrained_path — the offline
        analogue of the reference's URL downloads). Missing files log a
        warning and leave the random weights (useful for smoke tests)."""
        import logging
        import os

        log = logging.getLogger(__name__)
        params = dict(params)
        ae_path = self.config.audio_encoder.get("pretrained_path")
        if self.upstream is not None:
            if self.config.audio_encoder.get("pretrained", False):
                log.warning(
                    "pretrained weights for generic s3prl upstream %s are "
                    "not available offline; keeping random init (the "
                    "reference supports pretrained=False the same way, "
                    "speech_encoder_plus.py:151-152)",
                    self.upstream.name,
                )
            ae_path = None
        if self.config.audio_encoder.get("pretrained", False) and ae_path:
            if os.path.exists(ae_path):
                from ..convert.from_torch import load_hubert_checkpoint

                params["audio_encoder"] = load_hubert_checkpoint(
                    ae_path, self.audio_cfg
                )
                log.info("loaded HuBERT weights from %s", ae_path)
            else:
                log.warning("HuBERT checkpoint %s not found; random init", ae_path)
        reinit = list(self.config.audio_encoder.get("reinit_layers", []) or [])
        if reinit and self.upstream is not None:
            raise NotImplementedError(
                "reinit_layers is a hubert-family feature (the reference "
                "gates it on name.startswith('hubert') too, "
                "speech_encoder_plus.py:157-183)"
            )
        if reinit:
            # re-randomize the selected encoder layers (reference
            # speech_encoder_plus.py:417-424)
            import jax as _jax

            fresh = hubert.hubert_init(_jax.random.key(0), self.audio_cfg)
            ae = dict(params["audio_encoder"])
            layers = list(ae["encoder"]["layers"])
            for i in reinit:
                layers[i] = fresh["encoder"]["layers"][i]
            ae["encoder"] = dict(ae["encoder"])
            ae["encoder"]["layers"] = layers
            params["audio_encoder"] = ae
            log.info("reinitialized HuBERT encoder layers %s", reinit)
        clip_path = self.config.clip.get("pretrained_path")
        if clip_path:
            if os.path.exists(clip_path):
                from ..convert.from_torch import load_clip_checkpoint
                from .clip import reduce_token_embedding

                clip_params = load_clip_checkpoint(clip_path, self.clip_cfg)
                if self.reduced_vocab is not None:
                    clip_params = reduce_token_embedding(
                        clip_params, self.reduced_vocab
                    )
                params["clip"] = clip_params
                log.info("loaded CLIP weights from %s", clip_path)
            else:
                log.warning("CLIP checkpoint %s not found; random init", clip_path)
        return params

    # ------------------------------------------------------- audio encoding
    def forward_audio(
        self,
        params: Params,
        wav: jnp.ndarray,
        wav_len: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        train: bool = False,
        return_hidden_states: bool = False,
    ):
        """(reference KWClipBase.forward_audio :91-118 +
        FairseqSpeechEncoder_Hubert.forward :520-634)"""
        train_encoder = train and self.config.audio_encoder.get("trainable", False)
        if wav.dtype == jnp.int16:
            # compact-transfer mode (loader compact_wav): int16 PCM on the
            # wire, rescaled here. int16 -> f32 is exact and /32768 is a
            # power-of-two scale, so this matches the host f32 path bit-for-
            # bit for PCM16 sources before the compute-dtype cast.
            wav = wav.astype(jnp.float32) * (1.0 / 32768.0)
        wav = wav.astype(self.compute_dtype)
        select = self.config.audio_encoder.feat_select_idx
        if (
            select == WEIGHTED_SUM_MODE
            and not return_hidden_states
            and self.upstream is None
            and not self.config.audio_encoder.get("trainable", False)
            and self.config.audio_encoder.get("wsum_remat", False)
        ):
            # frozen-encoder memory path: fold the weighted sum into the
            # layer loop + recompute on backward, so the N-state stack
            # (the large model's b256 OOM buffer) is never live. Exact
            # math; costs one extra frozen forward per training step.
            return hubert.hubert_frozen_weighted_sum(
                params["weighted_sum"],
                params["audio_encoder"],
                self.audio_cfg,
                wav,
                wav_len,
                norm_type=self.hidden_norm_type,
            )
        if self.upstream is not None:
            hidden_states, feat_len = self.upstream.apply(
                params["audio_encoder"], wav, wav_len,
                rng=rng, train=train_encoder,
            )
        else:
            hidden_states, feat_len = hubert.hubert_apply(
                params["audio_encoder"],
                self.audio_cfg,
                wav,
                wav_len,
                rng=rng,
                train=train_encoder,
            )
        if not self.config.audio_encoder.get("trainable", False):
            hidden_states = jax.tree.map(jax.lax.stop_gradient, hidden_states)
        if self.hidden_norm_type in ("method1", "method2"):
            hidden_states = hubert.normalize_hidden_states(
                hidden_states, self.hidden_norm_type
            )

        if select == WEIGHTED_SUM_MODE:
            feat = weighted_sum_apply(
                params["weighted_sum"],
                hidden_states,
                normalize_features=self.hidden_norm_type == "s3prl",
            )
        elif select == "last_hidden_state":
            feat = hidden_states[-1]
        elif select in ("hidden_states", "all"):
            # reference named-key selection (speech_encoder_plus.py:296-306):
            # the full per-layer state tuple
            feat = hidden_states
        elif isinstance(select, (list, tuple)):
            feat = [hidden_states[i] for i in select]
        else:
            raise KeyError(select)
        if return_hidden_states:
            return feat, feat_len, hidden_states
        return feat, feat_len

    def encode_image_tower(
        self, params: Params, images: jnp.ndarray
    ) -> jnp.ndarray:
        """The (frozen unless configured otherwise) CLIP image tower alone —
        no trainable projection. uint8 input takes the batched on-device
        resize+normalize path (data/image.py device_clip_preprocess).

        Split out so the trainer can PRECOMPUTE these features once per fit
        when ``trainer.cache_image_features`` is set: the tower is frozen
        and the reference applies no image augmentation (its preprocess is
        deterministic, clip_official.py:160-164), so per-step recomputation
        is pure waste — ~14 ms/step of ViT forward and the whole image H2D
        stream at b256."""
        if images.dtype == jnp.uint8:
            from ..data.image import device_clip_preprocess

            images = device_clip_preprocess(
                images, self.clip_cfg.vision.image_size
            )
        images = images.astype(self.compute_dtype)
        feat = clip_mod.encode_image(params["clip"], self.clip_cfg, images)
        return jax.lax.stop_gradient(feat) if not self.config.clip.get(
            "image_encoder_trainable", False
        ) else feat

    def project_image_feat(
        self, params: Params, feat: jnp.ndarray, rng=None, train: bool = False
    ) -> jnp.ndarray:
        """The TRAINABLE tail of the image path (optional MLP projection,
        reference :1148-1187) — applied per step even when the frozen tower
        output comes from the cache."""
        if "img_enc_proj" in params:
            proj_cfg = self.config.model_settings.image_encoder_projection
            feat = mlp_apply(
                params["img_enc_proj"],
                feat,
                dropout_rate=proj_cfg.get("dropout", 0.1),
                rng=rng,
                train=train,
            )
        return feat

    def forward_image(
        self, params: Params, images: jnp.ndarray, rng=None, train: bool = False
    ) -> jnp.ndarray:
        """(reference forward_image :504-527 + optional MLP projection
        :1400-1402)."""
        return self.project_image_feat(
            params, self.encode_image_tower(params, images), rng=rng, train=train
        )

    def forward_text(
        self,
        params: Params,
        text: jnp.ndarray,
        eot_positions: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return clip_mod.encode_text(
            params["clip"], self.clip_cfg, text, eot_positions
        )

    # --------------------------------------------------------------- forward
    def forward(
        self,
        params: Params,
        state: Params,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        train: bool = False,
        num_updates: Optional[jnp.ndarray] = None,
    ) -> Tuple[Dict, Dict, Dict, Params]:
        """(reference KWClip_GeneralTransformer.forward :1385-1478)

        Returns (loss_feats, log_metrics, others, new_state); loss_feats feeds
        compute_loss (the reference's training_step/step_end contract).
        """
        if rng is not None:
            r_audio, r_img, r_casc, r_par, r_cproj, r_pproj = jax.random.split(
                rng, 6
            )
        else:
            r_audio = r_img = r_casc = r_par = r_cproj = r_pproj = None

        audio_feat, audio_len = self.forward_audio(
            params, batch["wav"], batch["wav_len"], rng=r_audio, train=train
        )
        if "image_feat_frozen" in batch:
            # trainer-cached frozen-tower features (trainer.cache_image_
            # features): the tower ran once per fit; only the trainable
            # projection runs per step. Mathematically the computation the
            # reference performs every step — memoized.
            image_feat = self.project_image_feat(
                params,
                batch["image_feat_frozen"].astype(self.compute_dtype),
                rng=r_img,
                train=train,
            )
        else:
            image_feat = self.forward_image(
                params, batch["image"], rng=r_img, train=train
            )

        cascaded_audio_feat = None
        parallel_audio_feat = None
        vq_results = None
        keywords = None
        new_state = state
        if self.use_cascaded:
            (
                cascaded_audio_feat,
                vq_results,
                keywords,
                branch_state,
            ) = branches.cascaded_branch_apply(
                params["cascaded_branch"],
                state.get("cascaded_branch", {}),
                self.config.model_settings.cascaded_branch,
                params["clip"],
                self.clip_cfg,
                self.sot_id,
                self.eot_id,
                audio_feat,
                audio_len,
                rng=r_casc,
                train=train,
                num_updates=num_updates,
            )
            new_state = dict(state)
            if branch_state:
                new_state["cascaded_branch"] = branch_state
            if "c_branch_proj" in params:
                proj_cfg = self.config.model_settings.cascaded_branch_projection
                cascaded_audio_feat = mlp_apply(
                    params["c_branch_proj"],
                    cascaded_audio_feat,
                    dropout_rate=proj_cfg.get("dropout", 0.1),
                    rng=r_cproj,
                    train=train,
                )

        if self.use_parallel:
            parallel_audio_feat = branches.parallel_branch_apply(
                params["parallel_branch"],
                self.config.model_settings.parallel_branch,
                audio_feat,
                audio_len,
                rng=r_par,
                train=train,
            )
            if "p_branch_proj" in params:
                proj_cfg = self.config.model_settings.parallel_branch_projection
                parallel_audio_feat = mlp_apply(
                    params["p_branch_proj"],
                    parallel_audio_feat,
                    dropout_rate=proj_cfg.get("dropout", 0.1),
                    rng=r_pproj,
                    train=train,
                )

        image_feat = l2_normalize(image_feat.astype(jnp.float32))
        loss_feats: Dict[str, Any] = {"id": batch["id"], "image_feat": image_feat}
        log_metrics: Dict[str, Any] = {}
        if cascaded_audio_feat is not None:
            cascaded_audio_feat = l2_normalize(cascaded_audio_feat.astype(jnp.float32))
            loss_feats["cascaded_audio_feat"] = cascaded_audio_feat
        if parallel_audio_feat is not None:
            parallel_audio_feat = l2_normalize(parallel_audio_feat.astype(jnp.float32))
            loss_feats["parallel_audio_feat"] = parallel_audio_feat
        if self.use_cascaded:
            log_metrics["softmax_temp"] = vq_results["temp"]
        log_metrics["cl_temp"] = self._current_cl_temperature(params)
        others = {
            "cascaded_audio_feat": cascaded_audio_feat,
            "parallel_audio_feat": parallel_audio_feat,
            "image_feat": image_feat,
            "id": batch["id"],
            "vq_results": vq_results,
            "keywords": keywords,
        }
        return loss_feats, log_metrics, others, new_state

    # ---------------------------------------------------------------- loss
    def _current_cl_temperature(self, params: Params) -> jnp.ndarray:
        if self.loss_type == "MaskedContrastiveLoss":
            return 1.0 / contrastive_temperature(
                params["criterion"],
                self.loss_kwargs["temperature"],
                self.loss_kwargs["temperature_trainable"],
            )
        if self.loss_kwargs["temperature_trainable"]:
            return params["criterion"]["temp"]
        return jnp.asarray(self.loss_kwargs["temperature"], jnp.float32)

    def _pair_loss(self, params, audio_feat, image_feat, ids) -> jnp.ndarray:
        if self.loss_type == "MaskedContrastiveLoss":
            return masked_contrastive_loss(
                params["criterion"], audio_feat, image_feat, ids, **self.loss_kwargs
            )
        from ..ops.losses import supcon_loss

        features = jnp.stack([audio_feat, image_feat], axis=1)
        return supcon_loss(
            features,
            temperature=self._current_cl_temperature(params),
            labels=ids,
            contrast_mode=self.loss_kwargs["contrast_mode"],
            base_temperature=self.loss_kwargs["base_temperature"],
        )

    def compute_loss(self, params: Params, loss_feats: Dict) -> Dict:
        """(reference compute_loss :1248-1297) — global-batch math; under
        pjit the batch axis may be sharded and XLA gathers as needed."""
        ms = self.config.model_settings
        ids = loss_feats["id"]
        image_feat = loss_feats["image_feat"].astype(jnp.float32)
        losses = {"loss": jnp.zeros((), jnp.float32)}
        if ms.get("cascaded_objective_weight", 0.0) > 0:
            losses["c_cl_loss"] = self._pair_loss(
                params,
                loss_feats["cascaded_audio_feat"].astype(jnp.float32),
                image_feat,
                ids,
            )
            losses["loss"] = (
                losses["loss"] + ms.cascaded_objective_weight * losses["c_cl_loss"]
            )
        if ms.get("parallel_objective_weight", 0.0) > 0:
            losses["p_cl_loss"] = self._pair_loss(
                params,
                loss_feats["parallel_audio_feat"].astype(jnp.float32),
                image_feat,
                ids,
            )
            losses["loss"] = (
                losses["loss"] + ms.parallel_objective_weight * losses["p_cl_loss"]
            )
        return losses

    # ----------------------------------------------------------- inference
    def encode_speech(
        self,
        params: Params,
        state: Params,
        wav: jnp.ndarray,
        wav_len: jnp.ndarray,
    ) -> Dict[str, Any]:
        """(reference encode_speech :1299-1383)"""
        audio_feat, audio_len = self.forward_audio(params, wav, wav_len)
        out: Dict[str, Any] = {}
        if self.use_cascaded:
            feat, vq_results, keywords, _ = branches.cascaded_branch_apply(
                params["cascaded_branch"],
                state.get("cascaded_branch", {}),
                self.config.model_settings.cascaded_branch,
                params["clip"],
                self.clip_cfg,
                self.sot_id,
                self.eot_id,
                audio_feat,
                audio_len,
            )
            if "c_branch_proj" in params:
                feat = mlp_apply(params["c_branch_proj"], feat)
            out["cascaded_audio_feat"] = l2_normalize(feat.astype(jnp.float32))
            out["vq_results"] = vq_results
            out["keywords"] = keywords
        if self.use_parallel:
            feat = branches.parallel_branch_apply(
                params["parallel_branch"],
                self.config.model_settings.parallel_branch,
                audio_feat,
                audio_len,
            )
            if "p_branch_proj" in params:
                feat = mlp_apply(params["p_branch_proj"], feat)
            out["parallel_audio_feat"] = l2_normalize(feat.astype(jnp.float32))
        return out

    def extract_hidden_states(
        self,
        params: Params,
        wav: jnp.ndarray,
        wav_len: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        """== feature_extractor_s3prl (reference :1214-1246): HuBERT hidden
        states + branch hidden states (CLS stripped, first entry dropped)."""
        audio_feat, audio_len, hidden_states = self.forward_audio(
            params, wav, wav_len, return_hidden_states=True
        )
        hidden_states = tuple(hidden_states)
        if self.use_cascaded:
            extra = branches.cascaded_branch_hidden_states(
                params["cascaded_branch"],
                self.config.model_settings.cascaded_branch,
                audio_feat,
                audio_len,
            )
            hidden_states = hidden_states + tuple(extra[1:])
        if self.use_parallel:
            extra = branches.parallel_branch_hidden_states(
                params["parallel_branch"],
                self.config.model_settings.parallel_branch,
                audio_feat,
                audio_len,
            )
            hidden_states = hidden_states + tuple(extra[1:])
        return hidden_states[-1], hidden_states

    def get_attention_weights(
        self, params: Params, wav: jnp.ndarray, wav_len: jnp.ndarray
    ) -> jnp.ndarray:
        """(reference get_attention_weights :1480-1496)"""
        audio_feat, audio_len = self.forward_audio(params, wav, wav_len)
        return branches.cascaded_branch_attention_map(
            params["cascaded_branch"],
            self.config.model_settings.cascaded_branch,
            audio_feat,
            audio_len,
        )

    def get_attention_map(
        self,
        params: Params,
        state: Params,
        wav: jnp.ndarray,
        wav_len: jnp.ndarray,
        tokenizer=None,
        top_k: int = 10,
    ):
        """Full visualization contract of reference getAttentionMap
        (kwClip.py:918-1001): per-sample CLS attention maps trimmed to the
        valid length, plus each keyword's top-k nearest subwords (special
        tokens suppressed) decoded to strings when a tokenizer is given.

        -> (cls_weights: list of (H, K, K+len_i) arrays, topk_kw: list of
        [keyword][k] subword strings or reduced ids)
        """
        audio_feat, audio_len = self.forward_audio(params, wav, wav_len)
        branch_cfg = self.config.model_settings.cascaded_branch
        weights = branches.cascaded_branch_attention_map(
            params["cascaded_branch"], branch_cfg, audio_feat, audio_len
        )
        keywords = branches.project_keywords_for_visualization(
            params["cascaded_branch"],
            state.get("cascaded_branch", {}),
            branch_cfg,
            audio_feat,
            audio_len,
        )
        emb_table = params["clip"]["text"]["token_embedding"]
        scores = branches.cosine_scores(keywords, emb_table)
        # suppress special tokens. The reference hardcodes rows {0, 2, 3}
        # (kwClip.py:975-977) — correct ONLY for the shipped byfreq table
        # layout where those rows are original ids {0 ('!'), SOT, EOT};
        # with a byID table or the full vocab the same rows are ordinary
        # tokens while SOT/EOT rank freely. Suppress by IDENTITY instead:
        # identical behavior on the shipped tables, correct elsewhere.
        suppress = {self.sot_id, self.eot_id}
        if self.reduced_vocab is not None:
            row0 = self.reduced_vocab.original_to_reduced.get(0)
            if row0 is not None:
                suppress.add(row0)
        else:
            suppress.add(0)
        for tok in sorted(suppress):
            scores = scores.at[..., tok].add(-100.0)
        _, top_ids = jax.lax.top_k(scores, top_k)

        weights_np = np.asarray(jax.device_get(weights))
        lens_np = np.asarray(jax.device_get(audio_len))
        ids_np = np.asarray(jax.device_get(top_ids))
        cls_weights = [
            weights_np[i, :, :, : int(lens_np[i]) + self.keyword_num]
            for i in range(weights_np.shape[0])
        ]
        topk_kw = []
        for b in range(ids_np.shape[0]):
            per_kw = []
            for k in range(ids_np.shape[1]):
                row = []
                for idx in ids_np[b, k]:
                    orig = (
                        self.reduced_vocab.reduced_to_original[int(idx)]
                        if self.reduced_vocab is not None
                        else int(idx)
                    )
                    if tokenizer is not None:
                        row.append(
                            tokenizer.decoder[orig].replace("</w>", "")
                        )
                    else:
                        row.append(orig)
                per_kw.append(row)
            topk_kw.append(per_kw)
        return cls_weights, topk_kw

    # ------------------------------------------------------ trainable mask
    def trainable_mask(self, params: Params) -> Params:
        """Boolean pytree: True = optimized. Mirrors getTrainableParams
        (reference :647-664, :1189-1212): branches, projections, weighted
        sum, criterion temperature; frozen towers excluded unless configured
        trainable."""
        cfg = self.config

        def mask_subtree(tree, value):
            return jax.tree.map(lambda _: value, tree)

        reinit_layers = list(cfg.audio_encoder.get("reinit_layers", []) or [])
        unfreeze_layers = list(cfg.audio_encoder.get("unfreeze_layers", []) or [])
        assert not (reinit_layers and unfreeze_layers)

        mask = {}
        for key, sub in params.items():
            if key == "audio_encoder":
                trainable = bool(cfg.audio_encoder.get("trainable", False))
                selected = reinit_layers or unfreeze_layers
                if selected and self.upstream is not None:
                    raise NotImplementedError(
                        "reinit/unfreeze_layers are hubert-family features "
                        "(reference speech_encoder_plus.py:157-198)"
                    )
                if trainable and selected:
                    # partial fine-tune: only the selected encoder layers
                    # (plus the top LayerNorm for post-norm models when
                    # reinitializing) move — reference trainable_params
                    # contract (speech_encoder_plus.py:478-494)
                    m = mask_subtree(sub, False)
                    for i in selected:
                        m["encoder"]["layers"][i] = mask_subtree(
                            sub["encoder"]["layers"][i], True
                        )
                    if reinit_layers and not self.audio_cfg.layer_norm_first:
                        m["encoder"]["layer_norm"] = mask_subtree(
                            sub["encoder"]["layer_norm"], True
                        )
                    mask[key] = m
                elif selected:
                    # selected && not trainable: same guard as __init__
                    # (reference `assert self.trainable`,
                    # speech_encoder_plus.py:172/186), repeated here for
                    # configs mutated after construction
                    raise ValueError(
                        "audio_encoder.reinit_layers/unfreeze_layers "
                        "require audio_encoder.trainable: true"
                    )
                else:
                    mask[key] = mask_subtree(sub, trainable)
            elif key == "clip":
                img_t = bool(cfg.clip.get("image_encoder_trainable", False))
                txt_t = bool(cfg.clip.get("text_encoder_trainable", False))
                mask[key] = {
                    "visual": mask_subtree(sub["visual"], img_t),
                    "text": mask_subtree(sub["text"], txt_t),
                    "logit_scale": False,
                }
            elif key == "criterion":
                mask[key] = mask_subtree(
                    sub, bool(self.loss_kwargs["temperature_trainable"])
                )
            else:
                mask[key] = mask_subtree(sub, True)
        return mask
