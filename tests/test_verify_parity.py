"""Smoke-drives scripts/verify_parity.py end to end on synthetic assets.

The released-checkpoint R@k parity bar (BASELINE.md; reference ckpts from
/root/reference/download_ckpts.sh:7-23) is environment-blocked — zero
egress, five rounds of dated download attempts in docs/DESIGN_NOTES.md —
and scripts/verify_parity.py is the recipe that claim rides on. This test
proves the RECIPE itself runs: a synthetic reference Lightning .ckpt
(the exact KWClip_GeneralTransformer state-dict naming, from
tests/test_reference_ckpt.py) over a synthetic Flickr tree, through
conversion -> dataset -> bucketed loader -> jitted encode -> retrieval ->
printed R@1/5/10. If egress ever opens, the only untested inputs are the
real files.
"""

import os
import subprocess
import sys

import pytest
import torch

from tests.test_cli import REPO
from tests.test_data import write_jpg, write_wav
from tests.test_models import tiny_speechclip_config
from tests.test_reference_ckpt import build_reference_ckpt


@pytest.mark.slow
def test_verify_parity_recipe_runs(tmp_path):
    # synthetic Flickr tree: 6 dev images x 1 caption each
    root = tmp_path / "corpus"
    (root / "flickr_audio" / "wavs").mkdir(parents=True)
    (root / "Images").mkdir()
    captions = []
    for i in range(6):
        name = f"vp{i:03d}"
        write_jpg(root / "Images" / f"{name}.jpg", size=48, seed=i)
        write_wav(
            root / "flickr_audio" / "wavs" / f"{name}_0.wav",
            1600 + 100 * i,
            seed=i,
        )
        captions.append(f"{name}.jpg#0\tverify parity caption {i} .")
    (root / "Flickr8k.token.txt").write_text("\n".join(captions))
    (root / "Flickr_8k.trainImages.txt").write_text("")
    (root / "Flickr_8k.devImages.txt").write_text(
        "\n".join(f"vp{i:03d}.jpg" for i in range(6))
    )
    (root / "Flickr_8k.testImages.txt").write_text("")

    # the checkpoint carries its config (reference save_hyperparameters
    # contract, avssl/model/base_model.py:14) — dataset block included
    config = tiny_speechclip_config(tmp_path)
    config.merge_(
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
            "audio_encoder": {"max_audio_len": 2400},
        }
    )
    ckpt, _ = build_reference_ckpt(config)
    # the released filename convention (download_ckpts.sh) — the script
    # only needs the path, but keep the realistic shape
    ckpt_path = tmp_path / "epoch_0-step_0-val_recall_mean_1_0.0000.ckpt"
    torch.save(ckpt, str(ckpt_path))

    result = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "verify_parity.py"),
            "--ckpt",
            str(ckpt_path),
            "--dataset_root",
            str(root),
            "--split",
            "dev",
            "--batch_size",
            "4",
            "--platform",
            "cpu",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    out = result.stdout
    assert "speech->image:" in out and "image->speech:" in out, out
    assert "mean:" in out, out
    # 6 audio vs 6 deduped images: every recall@k is in (0, 100]
    mean_line = [l for l in out.splitlines() if l.startswith("mean:")][0]
    assert any(ch.isdigit() for ch in mean_line), mean_line
