"""Per-fit frozen image-feature cache (trainer.cache_image_features).

The CLIP image tower is frozen and the reference applies no image
augmentation, so its per-step forward is a pure recompute — the trainer can
run the tower ONCE over the dataset's unique images and feed cached
features (the train loader then never decodes or ships images: at b256
that removes ~14 ms/step of ViT forward and the whole image H2D stream).
Mathematically it is the exact computation the reference performs per step,
memoized; these tests pin that equivalence.
"""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_tpu.models.speechclip import SpeechCLIPModel
from speechclip_tpu.training.trainer import Trainer
from tests.test_models import tiny_speechclip_config
from tests.test_trainer import corpus, tokenizer, trainer_config  # noqa: F401


class TestModelCachedImagePath:
    @pytest.mark.slow
    def test_forward_with_cached_features_matches_images(self, tmp_path):
        """forward() fed image_feat_frozen (= encode_image_tower output)
        must reproduce forward() fed pixels — same loss, same features."""
        cfg = tiny_speechclip_config(tmp_path)
        cfg.trainer.precision = 32
        model = SpeechCLIPModel(cfg)
        params, state = model.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        batch = {
            "wav": jnp.asarray(rng.standard_normal((4, 2000)).astype(np.float32)),
            "wav_len": jnp.asarray(np.array([2000, 1500, 1000, 2000])),
            "image": jnp.asarray(
                rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
            ),
            "id": jnp.asarray(np.arange(4)),
        }
        feats_a, _, _, _ = model.forward(params, state, batch)

        cached = model.encode_image_tower(params, batch["image"])
        batch_c = {k: v for k, v in batch.items() if k != "image"}
        batch_c["image_feat_frozen"] = jnp.asarray(
            np.asarray(cached, np.float32)
        )
        feats_b, _, _, _ = model.forward(params, state, batch_c)

        np.testing.assert_allclose(
            np.asarray(feats_a["image_feat"]),
            np.asarray(feats_b["image_feat"]),
            atol=1e-6,
        )
        loss_a = model.compute_loss(params, feats_a)["loss"]
        loss_b = model.compute_loss(params, feats_b)["loss"]
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)

    def test_cache_rejected_with_trainable_tower(
        self, trainer_config, tokenizer  # noqa: F811
    ):
        cfg = copy.deepcopy(trainer_config)
        cfg.trainer.cache_image_features = True
        cfg.clip.image_encoder_trainable = True
        trainer = Trainer(cfg, tokenizer=tokenizer)
        with pytest.raises(ValueError, match="frozen image tower"):
            trainer.build_loaders()


class TestTrainerWithImageCache:
    @pytest.mark.slow
    def test_fit_trajectory_matches_uncached(
        self, trainer_config, tokenizer, tmp_path  # noqa: F811
    ):
        """Same seed, same data: the cached fit must track the uncached fit
        (tolerance covers XLA fusion differences between the standalone
        tower jit and the fused train step), and the cached train loader
        must not carry images at all."""
        trained = {}
        recalls = {}
        for cached in (False, True):
            cfg = copy.deepcopy(trainer_config)
            cfg.trainer.default_root_dir = str(tmp_path / f"run{int(cached)}")
            cfg.trainer.cache_image_features = cached
            trainer = Trainer(cfg, tokenizer=tokenizer)
            if cached:
                train_loader, _ = trainer.build_loaders()
                batch = next(iter(train_loader))
                assert "image" not in batch  # loader ships no pixels
            state = trainer.fit()
            trained[cached] = jax.device_get(
                {
                    "ws": state.params["weighted_sum"]["weights"],
                    "proj": state.params["parallel_branch"]["proj"]["w"],
                }
            )
            metrics = trainer.validate(state, trainer.build_eval_loader("dev"))
            recalls[cached] = metrics["val_recall_mean_10"]

        # the trained parameters must track each other (tolerance covers
        # XLA fusion differences between the standalone tower jit and the
        # fused train step; val_loss is NOT compared — the tiny all-ragged
        # dev set pads dummy rows whose contamination differs by pad style)
        np.testing.assert_allclose(
            trained[True]["ws"], trained[False]["ws"], rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            trained[True]["proj"], trained[False]["proj"], rtol=1e-3, atol=1e-6
        )
        # the 2-image dev gallery saturates recall@10 at 100 for any
        # ranking, so this equality cannot flake on feature perturbations
        assert recalls[True] == recalls[False] == 100.0


class TestCacheWithResNetTower:
    def test_validate_with_rn_tower_and_cache(
        self, trainer_config, tokenizer, tmp_path  # noqa: F811
    ):
        """The eval-cache tower fingerprint must work for BOTH tower
        families: the ModifiedResNet visual tree has no class_embedding
        leaf (the old signature crashed validation with KeyError)."""
        from speechclip_tpu.config import ConfigNode

        cfg = copy.deepcopy(trainer_config)
        cfg.trainer.default_root_dir = str(tmp_path / "rn_run")
        cfg.trainer.cache_image_features = True
        cfg.clip.custom.vision = ConfigNode(
            {
                "arch": "resnet",
                "image_size": 64,
                "width": 8,
                "layers": [1, 1, 1, 1],
                "heads": 4,
                "output_dim": 16,
            }
        )
        trainer = Trainer(cfg, tokenizer=tokenizer)
        from speechclip_tpu.training.train_step import (
            create_train_state,
            place_state,
        )

        state = place_state(
            create_train_state(trainer.model, trainer.tx, jax.random.key(0)),
            trainer.mesh,
        )
        metrics = trainer.validate(state, trainer.build_eval_loader("dev"))
        assert np.isfinite(metrics["val_loss"])
