"""Recipe and shipped-config validation (hermetic).

The reference ships 12 egs shell recipes and 6 model configs (SURVEY.md
§2.1 recipes, §5 config system); these tests pin that surface here: every
recipe references an existing config with valid CLI flags, and every shipped
config resolves into a constructible model description (tower configs, loss
wiring, branch selection) without touching the network or a device.
"""

import re
from pathlib import Path

import pytest
import yaml

from speechclip_tpu.config import ConfigNode
from speechclip_tpu.models import clip as clip_mod, hubert
from speechclip_tpu.models.speechclip import SpeechCLIPModel, resolve_tower_configs

REPO = Path(__file__).resolve().parent.parent
# the train/test recipe contract below applies to the reference-mirroring
# 12 recipes; other egs scripts (e.g. serving) have their own checks
RECIPES = sorted(
    p for p in REPO.glob("egs/**/*.sh") if p.name in ("train.sh", "test.sh")
)
CONFIGS = sorted(REPO.glob("configs/**/*.yaml"))


class TestRecipes:
    def test_twelve_recipes_exist(self):
        # 6 train + 6 test, mirroring the reference egs tree
        train = [p for p in RECIPES if p.name == "train.sh"]
        test = [p for p in RECIPES if p.name == "test.sh"]
        assert len(train) == 6 and len(test) == 6, RECIPES

    @pytest.mark.parametrize("recipe", RECIPES, ids=lambda p: str(p.relative_to(REPO)))
    def test_recipe_config_exists_and_flags_parse(self, recipe):
        text = recipe.read_text()
        m = re.search(r"--config\s+(\S+)", text)
        assert m, f"{recipe} has no --config"
        cfg_path = REPO / m.group(1)
        assert cfg_path.exists(), cfg_path
        assert "run_task.py TrainKWClip_GeneralTransformer" in text.replace(
            "\\\n", " "
        ).replace("python3 ", "").replace("python ", "")
        # test recipes must dispatch eval/test; train recipes must train
        if recipe.name == "train.sh":
            assert "--train" in text
        else:
            assert "--test" in text or "--eval" in text

        # every long flag must be one the task's parser accepts
        import argparse

        from speechclip_tpu.tasks.base_task import BaseTask

        parser = BaseTask().add_args(argparse.ArgumentParser())
        known = set()
        for action in parser._actions:
            known.update(action.option_strings)
        for flag in re.findall(r"(--[a-z_]+)", text):
            assert flag in known, f"{recipe}: unknown flag {flag}"


class TestShippedConfigs:
    def test_six_configs(self):
        assert len(CONFIGS) == 6, CONFIGS

    @pytest.mark.parametrize("path", CONFIGS, ids=lambda p: str(p.relative_to(REPO)))
    def test_config_resolves_to_model(self, path):
        cfg = ConfigNode(yaml.safe_load(path.read_text()))
        # construction WITH the vendored table is covered by
        # tests/test_vocab_tables.py; here resolve the rest of the config
        # without it to keep this test focused on tower/branch wiring
        assert cfg.clip.reduce_subword_embbedding
        stats = "coco_stat" if "coco" in str(path) else "flickr_stat"
        assert stats in cfg.clip.reduce_subword_embbedding
        cfg.clip.reduce_subword_embbedding = None
        model = SpeechCLIPModel(cfg)
        audio_cfg, clip_cfg = resolve_tower_configs(cfg)

        is_large = "large" in str(path)
        if is_large:
            assert audio_cfg is not hubert.HUBERT_BASE
            assert audio_cfg.encoder_layers == 24
            assert clip_cfg is clip_mod.NAMED_CONFIGS["ViT-L/14"]
            # large configs train the loss temperature (SURVEY.md §5)
            assert cfg.cl_loss.args.temperature_trainable
            assert cfg.audio_encoder.normalize_hiddenstates
        else:
            assert audio_cfg.encoder_layers == 12
            assert clip_cfg is clip_mod.NAMED_CONFIGS["ViT-B/32"]

        is_cascaded = path.name == "spchclp_c.yaml"
        assert model.use_cascaded == is_cascaded
        assert model.use_parallel != is_cascaded

        # the reference's training hyperparameters (config/.../spchclp_p.yaml)
        assert cfg.trainer.gradient_clip_val == 4
        assert cfg.audio_encoder.scheduler.name == "linear_warmup_decay"

    @pytest.mark.parametrize("path", CONFIGS, ids=lambda p: str(p.relative_to(REPO)))
    def test_dataset_block_matches_directory(self, path):
        cfg = ConfigNode(yaml.safe_load(path.read_text()))
        name = cfg.data.dataset.name
        if "coco" in str(path):
            assert name == "coco"
        else:
            assert name == "flickr"


class TestServingRecipe:
    def test_export_and_serve_wiring(self):
        """The serving recipe must drive the real export/serving CLIs and
        use only flags their parsers accept (pinned against the modules'
        documented option sets)."""
        recipe = REPO / "egs/serving/export_and_serve.sh"
        text = recipe.read_text()
        assert "speechclip_tpu.export" in text
        assert "speechclip_tpu.serving" in text

        export_flags = {"--ckpt", "--out", "--batch", "--wav-samples", "--dtype"}
        serve_flags = {"--artifacts", "--port", "--warmup"}
        used = set(re.findall(r"(--[a-z-]+)", text))
        assert export_flags | serve_flags >= used, used - (export_flags | serve_flags)

    def test_serve_from_ckpt_wiring(self):
        """The jit-backend recipe must use only flags the serving CLI
        accepts (no export step — from_checkpoint serves directly)."""
        recipe = REPO / "egs/serving/serve_from_ckpt.sh"
        text = recipe.read_text()
        assert "speechclip_tpu.serving" in text
        assert "speechclip_tpu.export" not in text  # the point of the recipe
        assert "--ckpt" in text
        serve_flags = {
            "--ckpt",
            "--wav-samples",
            "--batch",
            "--dtype",
            "--compact-wav",
            "--max-wait-ms",
            "--warmup",
            "--port",
            "--gallery",
        }
        used = set(re.findall(r"(--[a-z-]+)", text))
        assert serve_flags >= used, used - serve_flags
        # every flag the recipe passes must exist in the CLI parser
        import speechclip_tpu.serving as serving_mod
        import inspect

        cli_src = inspect.getsource(serving_mod.main)
        for flag in used:
            assert f'"{flag}"' in cli_src, flag
