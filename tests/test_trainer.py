"""End-to-end trainer tests: synthetic Flickr corpus -> fit -> validate ->
checkpoint -> resume, on the 8-device CPU mesh."""

import gzip
import os

import pytest

import jax

from speechclip_tpu.models.tokenizer import CLIPTokenizer
from speechclip_tpu.training.trainer import Trainer
from tests.test_data import write_jpg, write_wav
from tests.test_models import tiny_speechclip_config


def make_tiny_bpe(path):
    """Minimal CLIP-style merges file: header line + a few merges."""
    merges = ["t h", "th e</w>", "a</w> ", "o f</w>", "i n</w>", "e r</w>"]
    merges = [m for m in merges if len(m.split()) == 2]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version: tiny\n")
        f.write("\n".join(merges))
    return str(path)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    (root / "flickr_audio" / "wavs").mkdir(parents=True)
    (root / "Images").mkdir()
    images = [f"im{i:03d}" for i in range(11)]
    captions = []
    for i, name in enumerate(images):
        write_jpg(root / "Images" / f"{name}.jpg", size=48, seed=i)
        for n in range(2):
            write_wav(
                root / "flickr_audio" / "wavs" / f"{name}_{n}.wav",
                1600 + 400 * n + i * 50,
                seed=i * 7 + n,
            )
            captions.append(f"{name}.jpg#{n}\tthe thing number {i} in photo {n} .")
    (root / "Flickr8k.token.txt").write_text("\n".join(captions))
    (root / "Flickr_8k.trainImages.txt").write_text(
        "\n".join(f"{n}.jpg" for n in images[:6])
    )
    (root / "Flickr_8k.devImages.txt").write_text(
        "\n".join(f"{n}.jpg" for n in images[6:8])
    )
    # test split deliberately a different size than dev so split selection
    # is observable from sample counts
    (root / "Flickr_8k.testImages.txt").write_text(
        "\n".join(f"{n}.jpg" for n in images[8:])
    )
    return root


@pytest.fixture(scope="module")
def trainer_config(corpus, tmp_path_factory):
    cfg_dir = tmp_path_factory.mktemp("cfgroot")
    cfg = tiny_speechclip_config(cfg_dir)
    cfg.merge_(
        {
            "data": {
                "dataset": {
                    "name": "flickr",
                    "dataset_root": str(corpus),
                    "text_file": "Flickr8k.token.txt",
                    "load_image": True,
                    "load_audio": True,
                    "tokenizeText": True,
                },
                "batch_size": 8,
                "dev_batch_size": 8,
            },
            "audio_encoder": {
                "max_audio_len": 2400,
                "optim": {"name": "Adam", "args": {"lr": 1e-3, "weight_decay": 1e-6}},
                "scheduler": {
                    "name": "linear_warmup_decay",
                    "warmup": 2,
                    "max_step": 10,
                    "final_lr": 1e-8,
                },
            },
            "trainer": {
                "max_steps": 3,
                "gradient_clip_val": 4,
                "check_val_every_n_epoch": 1,
                "precision": 32,
                "logger": "none",
                "log_every_n_steps": 1,
                "default_root_dir": str(tmp_path_factory.mktemp("exp")),
            },
            "log_setting": {
                "log_detokenize_results": True,
                "log_detokenize_results_every_n_epoch": 1,
            },
            "seed": 7122,
        }
    )
    # image_size must match the tiny CLIP tower
    return cfg


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    path = make_tiny_bpe(tmp_path_factory.mktemp("bpe") / "merges.txt.gz")
    return CLIPTokenizer(path)


class TestTokenizer:
    def test_roundtrip(self, tokenizer):
        ids = tokenizer.encode("the thing")
        assert ids
        text = tokenizer.decode(ids)
        assert "the" in text and "thing" in text

    def test_tokenize_shape_and_specials(self, tokenizer):
        out = tokenizer.tokenize(["hello world", "a"])
        assert out.shape == (2, 77)
        assert (out[:, 0] == tokenizer.sot_id).all()
        for row in out:
            assert tokenizer.eot_id in row

    def test_decode_specials_pass_through(self, tokenizer):
        text = tokenizer.decode([tokenizer.sot_id, tokenizer.eot_id])
        assert text == "<|startoftext|><|endoftext|>"

    def test_mojibake_repair(self):
        """Reference tokenization runs ftfy before cleaning
        (clip/simple_tokenizer.py); _fix_mojibake covers its core repair."""
        from speechclip_tpu.models.tokenizer import _clean, _fix_mojibake

        assert _fix_mojibake("cafÃ©") == "café"
        assert _fix_mojibake("donâ€™t") == "don’t"
        # double-encoded UTF-8 heals in two passes
        double = "é".encode("utf-8").decode("cp1252").encode("utf-8").decode("cp1252")
        assert _fix_mojibake(double) == "é"
        # well-formed text (ASCII and real accents) passes through
        assert _fix_mojibake("a dog runs.") == "a dog runs."
        assert _fix_mojibake("café") == "café"
        # NFC normalization (combining accent -> composed form), as in ftfy
        assert _fix_mojibake("café") == "café"
        assert _clean("  a&amp;amp;b   c ") == "a&b c"


class TestEvalSplitSelection:
    """--test must evaluate the test split, --eval the dev/val split
    (reference avssl/task/base_task.py:108-110, 236-245)."""

    def test_split_name_mapping(self, trainer_config, tokenizer):
        trainer = Trainer(trainer_config, tokenizer=tokenizer)
        assert trainer.eval_split_name("dev") == "dev"
        assert trainer.eval_split_name("test") == "test"
        with pytest.raises(ValueError):
            trainer.eval_split_name("train")
        # SpokenCOCO names its validation split "val"
        trainer.config.data.dataset.name = "coco"
        assert trainer.eval_split_name("dev") == "val"
        assert trainer.eval_split_name("test") == "test"
        trainer.config.data.dataset.name = "flickr"

    def test_build_eval_loader_uses_requested_split(
        self, trainer_config, tokenizer
    ):
        trainer = Trainer(trainer_config, tokenizer=tokenizer)
        dev = trainer.build_eval_loader("dev")
        test = trainer.build_eval_loader("test")
        # corpus: 2 dev images x 2 captions, 3 test images x 2 captions
        assert len(dev.dataset) == 4
        assert len(test.dataset) == 6

    def test_eval_batch_size_override(self, trainer_config, tokenizer):
        """data.eval_batch_size overrides dev_batch_size for eval loaders
        (hardware-throughput knob; val_loss parity needs dev_batch_size,
        see Trainer.build_eval_loader)."""
        trainer = Trainer(trainer_config, tokenizer=tokenizer)
        assert trainer.build_eval_loader("dev").batch_size == 8
        trainer.config.data.eval_batch_size = 4
        assert trainer.build_eval_loader("dev").batch_size == 4
        del trainer.config.data["eval_batch_size"]


    def test_eval_batch_size_must_divide_mesh(self, trainer_config, tokenizer):
        """An eval batch size indivisible by the data-mesh size must fail
        with the same clear up-front error fit() gives for the train loader
        — not an opaque jax sharding error on the first eval batch (every
        eval batch is padded to exactly batch_size and sharded)."""
        trainer = Trainer(trainer_config, tokenizer=tokenizer)
        if trainer.n_data == 1:
            pytest.skip("needs a multi-device data mesh")
        trainer.config.data.eval_batch_size = trainer.n_data + 1
        try:
            with pytest.raises(ValueError, match="divisible by the data-mesh"):
                trainer.validate(None)  # raises before state is touched
        finally:
            del trainer.config.data["eval_batch_size"]


class TestTrainerEndToEnd:
    @pytest.mark.slow
    def test_fit_validate_checkpoint_resume(self, trainer_config, tokenizer, monkeypatch):
        # the tiny CLIP tower takes 32x32 images
        from speechclip_tpu.data import datasets as ds_mod

        trainer = Trainer(trainer_config, tokenizer=tokenizer)
        # image_size must match the tiny tower (224 default)
        tl, dl = trainer.build_loaders()
        tl.dataset.image_size = 32
        dl.dataset.image_size = 32
        monkeypatch.setattr(Trainer, "build_loaders", lambda self: (tl, dl))

        state = trainer.fit()
        assert int(jax.device_get(state.step)) == 3

        workdir = trainer.workdir
        assert os.path.exists(os.path.join(workdir, "ckpts", "last"))
        assert os.path.exists(os.path.join(workdir, "ckpts", "config.yaml"))
        assert os.path.exists(os.path.join(workdir, "metrics.jsonl"))
        # two-monitor dirs
        assert os.path.isdir(os.path.join(workdir, "ckpts", "val_loss"))
        assert os.path.isdir(os.path.join(workdir, "ckpts", "val_recall_mean_10"))
        # keyword diagnostics dumped
        detok = os.path.join(workdir, "detokenizeText")
        assert any(f.startswith("kw_hit") for f in os.listdir(detok))

        # validation produces the reference's metric names
        metrics = trainer.validate(state, dl)
        assert "val_recall_mean_10" in metrics
        assert "val_loss" in metrics
        assert 0 <= metrics["val_recall_mean_10"] <= 100

        # resume: restore last and continue one more step
        trainer_config.trainer.max_steps = 4
        trainer2 = Trainer(trainer_config, tokenizer=tokenizer)
        monkeypatch.setattr(Trainer, "build_loaders", lambda self: (tl, dl))
        state2 = trainer2.fit(resume=os.path.join(workdir, "ckpts", "last"))
        assert int(jax.device_get(state2.step)) == 4
