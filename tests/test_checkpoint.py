"""CheckpointManager policy tests (two-monitor top-k, save_last, exact-step
snapshots, restore — reference base_task.py:176-193 + train_KWClip.py:17-68
contracts)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_tpu.config import ConfigNode
from speechclip_tpu.training.checkpoint import (
    CheckpointManager,
    load_config_from_checkpoint,
)


def make_state(value: float):
    return {"w": jnp.full((4,), value), "step": jnp.asarray(int(value))}


class TestCheckpointManager:
    def test_two_monitor_topk_policy(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        cfg = ConfigNode({"a": 1})
        # val_loss min top-1; val_recall_mean_10 max top-3
        history = [
            (10, {"val_loss": 5.0, "val_recall_mean_10": 10.0}),
            (20, {"val_loss": 3.0, "val_recall_mean_10": 30.0}),
            (30, {"val_loss": 4.0, "val_recall_mean_10": 20.0}),
            (40, {"val_loss": 6.0, "val_recall_mean_10": 40.0}),
            (50, {"val_loss": 2.0, "val_recall_mean_10": 5.0}),
        ]
        for step, metrics in history:
            mgr.save(make_state(step), step, metrics, cfg)
        mgr.wait()

        loss_dir = tmp_path / "val_loss"
        kept_loss = sorted(os.listdir(loss_dir))
        assert len(kept_loss) == 1 and "step50" in kept_loss[0]

        recall_dir = tmp_path / "val_recall_mean_10"
        kept_recall = sorted(os.listdir(recall_dir))
        assert len(kept_recall) == 3
        steps = {s.split("_step")[1].split("_")[0] for s in kept_recall}
        assert steps == {"20", "30", "40"}

        assert (tmp_path / "last").exists()
        assert (tmp_path / "config.yaml").exists()
        assert "step50" in mgr.best_path("val_loss")

    def test_save_at_steps(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), save_at_steps=[7])
        mgr.save(make_state(7), 7, {}, None)
        mgr.save(make_state(8), 8, {}, None)
        mgr.wait()
        assert (tmp_path / "step_7").exists()
        assert not (tmp_path / "step_8").exists()

    def test_restore_roundtrip(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        state = make_state(42)
        mgr.save(state, 42, {"val_loss": 1.0}, ConfigNode({"x": {"y": 2}}))
        mgr.wait()
        target = make_state(0)
        restored = mgr.restore_last(target)
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.full(4, 42.0))
        assert int(restored["step"]) == 42
        cfg = load_config_from_checkpoint(str(tmp_path / "last"))
        assert cfg.x.y == 2

    def test_index_survives_reload(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(make_state(1), 1, {"val_loss": 9.0}, None)
        mgr.wait()
        mgr2 = CheckpointManager(str(tmp_path))
        mgr2.save(make_state(2), 2, {"val_loss": 1.0}, None)
        mgr2.wait()
        kept = os.listdir(tmp_path / "val_loss")
        assert len(kept) == 1 and "step2" in kept[0]
