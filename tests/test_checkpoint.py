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

    def test_overwrite_drains_async_save_before_rmtree(self, tmp_path, monkeypatch):
        """Overwriting an existing checkpoint dir must drain the async
        checkpointer BEFORE the rmtree: orbax stages the commit in a tmp dir
        INSIDE the target (``last/state.orbax-checkpoint-tmp-*``) and only
        waits for previous ops *inside* save() — after an unguarded rmtree
        would already have deleted a still-committing tmp from the previous
        epoch's save, corrupting ``last`` (the resume="auto" checkpoint)."""
        import shutil as _shutil

        mgr = CheckpointManager(str(tmp_path))
        mgr.save(make_state(1), 1, {}, None)

        events = []
        real_wait = mgr._ckptr.wait_until_finished
        real_rmtree = _shutil.rmtree

        def spy_wait():
            events.append("wait")
            real_wait()

        def spy_rmtree(*a, **k):
            events.append("rmtree")
            real_rmtree(*a, **k)

        monkeypatch.setattr(mgr._ckptr, "wait_until_finished", spy_wait)
        monkeypatch.setattr(
            "speechclip_tpu.training.checkpoint.shutil.rmtree", spy_rmtree
        )
        mgr.save(make_state(2), 2, {}, None)
        mgr.wait()
        assert "rmtree" in events, "overwrite path not exercised"
        assert events.index("wait") < events.index("rmtree")

    def test_index_survives_reload(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(make_state(1), 1, {"val_loss": 9.0}, None)
        mgr.wait()
        mgr2 = CheckpointManager(str(tmp_path))
        mgr2.save(make_state(2), 2, {"val_loss": 1.0}, None)
        mgr2.wait()
        kept = os.listdir(tmp_path / "val_loss")
        assert len(kept) == 1 and "step2" in kept[0]


class TestSlimCheckpoints:
    """trainer.checkpoint_frozen: false — frozen towers excluded from disk
    (the reference embeds the full frozen state_dict in every checkpoint;
    SURVEY.md §5 flags exclusion as the rebuild improvement)."""

    def _state_and_mask(self, seed, frozen_value):
        from speechclip_tpu.training.train_step import TrainState

        params = {
            "tower": {"w": jnp.full((1000,), frozen_value)},  # frozen
            "branch": {"w": jax.random.normal(jax.random.key(seed), (4,))},
        }
        mask = {"tower": {"w": False}, "branch": {"w": True}}
        state = TrainState(
            params=params,
            model_state={"bn": jnp.zeros((2,))},
            opt_state=(),
            step=jnp.asarray(3),
            rng=jax.random.key(0),
        )
        return state, mask

    def test_slim_roundtrip_and_size(self, tmp_path):
        state, mask = self._state_and_mask(seed=1, frozen_value=7.0)
        mgr = CheckpointManager(str(tmp_path), slim_mask=mask)
        mgr.save(jax.device_get(state), 3, {}, None)
        mgr.wait()
        assert mgr.is_slim(str(tmp_path / "last"))

        # restore target carries DIFFERENT frozen weights (stand-in for
        # load_pretrained); they must survive, trainable must come from disk
        target, _ = self._state_and_mask(seed=99, frozen_value=11.0)
        restored = mgr.restore(str(tmp_path / "last"), jax.device_get(target))
        np.testing.assert_array_equal(
            np.asarray(restored.params["tower"]["w"]), np.full((1000,), 11.0)
        )
        np.testing.assert_allclose(
            np.asarray(restored.params["branch"]["w"]),
            np.asarray(state.params["branch"]["w"]),
        )
        assert int(restored.step) == 3

        # the frozen tower must not be on disk (1-element placeholder)
        total = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(tmp_path / "last")
            for f in fs
        )
        assert total < 1000 * 4  # far below the 4 KB tower alone

    def test_slim_restore_without_mask_errors(self, tmp_path):
        state, mask = self._state_and_mask(seed=1, frozen_value=7.0)
        mgr = CheckpointManager(str(tmp_path), slim_mask=mask)
        mgr.save(jax.device_get(state), 3, {}, None)
        mgr.wait()
        plain = CheckpointManager(str(tmp_path))
        with pytest.raises(ValueError, match="slim checkpoint"):
            plain.restore(str(tmp_path / "last"), jax.device_get(state))

    def test_full_checkpoints_unmarked(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(make_state(1), 1, {}, None)
        mgr.wait()
        assert not mgr.is_slim(str(tmp_path / "last"))
