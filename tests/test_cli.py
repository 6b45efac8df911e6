"""CLI end-to-end smoke test: run_task.py over a synthetic corpus in a
subprocess (the reference CLI contract, run_task.py:11-21)."""

import os
import subprocess
import sys

import pytest
import yaml

from tests.test_data import write_jpg, write_wav
from tests.test_models import tiny_speechclip_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_corpus")
    (root / "flickr_audio" / "wavs").mkdir(parents=True)
    (root / "Images").mkdir()
    captions = []
    for i in range(11):
        name = f"cl{i:03d}"
        write_jpg(root / "Images" / f"{name}.jpg", size=48, seed=i)
        write_wav(
            root / "flickr_audio" / "wavs" / f"{name}_0.wav", 1600 + 100 * i, seed=i
        )
        captions.append(f"{name}.jpg#0\tcli caption {i} .")
    (root / "Flickr8k.token.txt").write_text("\n".join(captions))
    (root / "Flickr_8k.trainImages.txt").write_text(
        "\n".join(f"cl{i:03d}.jpg" for i in range(6))
    )
    (root / "Flickr_8k.devImages.txt").write_text(
        "\n".join(f"cl{i:03d}.jpg" for i in range(6, 8))
    )
    # deliberately a different size (3) than dev (2) so the --test run is
    # distinguishable from a dev-split evaluation in the logs
    (root / "Flickr_8k.testImages.txt").write_text(
        "\n".join(f"cl{i:03d}.jpg" for i in range(8, 11))
    )

    cfg = tiny_speechclip_config(tmp_path_factory.mktemp("cli_vocab"))
    exp = tmp_path_factory.mktemp("cli_exp")
    cfg.merge_(
        {
            "data": {
                "dataset": {
                    "name": "flickr",
                    "dataset_root": str(root),
                    "text_file": "Flickr8k.token.txt",
                    "load_image": True,
                    "load_audio": True,
                    "tokenizeText": False,
                },
                "batch_size": 4,
                "dev_batch_size": 4,
            },
            "audio_encoder": {
                "max_audio_len": 2400,
                "optim": {"name": "Adam", "args": {"lr": 1e-3, "weight_decay": 0}},
                "scheduler": {
                    "name": "linear_warmup_decay",
                    "warmup": 2,
                    "max_step": 10,
                    "final_lr": 1e-8,
                },
            },
            "trainer": {
                "max_steps": 1,
                "gradient_clip_val": 4,
                "check_val_every_n_epoch": 1,
                "precision": 32,
                "logger": "none",
                "log_every_n_steps": 1,
                "default_root_dir": str(exp / "run"),
            },
            "log_setting": {"log_detokenize_results": False},
        }
    )
    # the tiny CLIP tower takes 32x32 images: datasets must decode at 32
    cfg_path = exp / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg.to_dict(), sort_keys=False))
    return cfg_path, exp


def run_cli(*args):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "run_task.py"), *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )


class TestDispatchErrors:
    def test_flags_before_task_is_a_usage_error(self):
        """`run_task.py --config x.yaml Task` binds 'x.yaml' to the task
        positional (argparse parse_known_args semantics, same as the
        reference dispatcher) — it must die with a usage error naming the
        task-first contract, not an AttributeError on a yaml path."""
        result = subprocess.run(
            [sys.executable, "run_task.py", "--config", "x.yaml",
             "TrainKWClip_GeneralTransformer", "--train"],
            capture_output=True, text=True, cwd=REPO, timeout=120,
        )
        assert result.returncode == 2, (result.returncode, result.stderr)
        assert "task name must come first" in result.stderr
        assert "TrainKWClip_GeneralTransformer" in result.stderr
        assert "AttributeError" not in result.stderr


@pytest.mark.slow
class TestCLI:
    def test_train_then_test(self, cli_setup):
        cfg_path, exp = cli_setup
        result = run_cli(
            "TrainKWClip_GeneralTransformer",
            "--config",
            str(cfg_path),
            "--train",
            "--platform",
            "cpu",
            "--override",
            "data.dataset.image_size=32",
        )
        assert result.returncode == 0, result.stderr[-3000:]
        ckpt_last = exp / "run" / "ckpts" / "last"
        assert ckpt_last.exists(), result.stderr[-2000:]

        result = run_cli(
            "TrainKWClip_GeneralTransformer",
            "--config",
            str(cfg_path),
            "--test",
            "--resume",
            str(ckpt_last),
            "--platform",
            "cpu",
        )
        assert result.returncode == 0, result.stderr[-3000:]
        # --test must evaluate the *test* split (3 samples), not dev (2):
        # reference avssl/task/base_task.py:108-110,236-245
        assert "validation metrics (test)" in result.stderr, result.stderr[-3000:]
        assert "Flickr8k (test): 3 samples" in result.stderr, result.stderr[-3000:]

        # AOT export CLI against the same checkpoint (restore contract:
        # config-from-ckpt, PRNG impl, slim handling live in Trainer)
        result = subprocess.run(
            [
                sys.executable, "-m", "speechclip_tpu.export",
                "--ckpt", str(ckpt_last), "--out", str(exp / "exports"),
                "--batch", "2", "--wav-samples", "2000", "--platform", "cpu",
            ],
            capture_output=True, text=True, cwd=REPO, timeout=600,
        )
        assert result.returncode == 0, result.stderr[-3000:]
        for name in ("encode_speech", "encode_image", "encode_text"):
            assert (exp / "exports" / f"{name}.stablehlo").exists()

        # embedding-extraction example against the same checkpoint
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=4"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        result = subprocess.run(
            [
                sys.executable,
                "-c",
                # force the cpu platform before example.main touches jax
                "import jax, sys; jax.config.update('jax_platforms','cpu'); "
                "sys.argv=['example.py','--ckpt', sys.argv[1]]; "
                "import example; example.main()",
                str(ckpt_last),
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            env=env,
            timeout=600,
        )
        assert result.returncode == 0, result.stderr[-3000:]
        assert "#hidden states" in result.stdout
        assert "parallel_audio_feat" in result.stdout
