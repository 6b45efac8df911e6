"""Orbax checkpointing with the reference's two-monitor policy.

Mirrors the reference's persistence design (SURVEY.md §5): two checkpoint
monitors — val_loss (min, top-1, plus save_last) and val_recall_mean_10
(max, top-3) (base_task.py:176-193) — plus exact-step snapshots
(CheckpointAtStep, train_KWClip.py:17-68). The config is serialized next to
the weights (the save_hyperparameters equivalent) so restore needs no YAML.

Saves are async (orbax) so the TPU never waits on the filesystem.

Slim mode (``trainer.checkpoint_frozen: false``): the reference embeds the
full frozen HuBERT+CLIP state_dict in every Lightning checkpoint
(base_model.py:14 save_hyperparameters + full state_dict — ~1.5 GB for
large). Here the frozen towers can be excluded: frozen leaves are stored as
0-size placeholders (structure-preserving) and a ``meta.json`` marks the
checkpoint; restore merges the stored trainable leaves into a target whose
frozen towers were populated from the pretrained assets (load_pretrained).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import ConfigNode

DEFAULT_MONITORS = (
    {"name": "val_loss", "mode": "min", "top_k": 1},
    {"name": "val_recall_mean_10", "mode": "max", "top_k": 3},
)


def strip_frozen_params(params: Any, trainable_mask: Any) -> Any:
    """Replace frozen leaves with 1-element placeholders (same tree
    structure, same dtype; orbax rejects 0-size arrays) so slim checkpoints
    stay restore-compatible."""
    return jax.tree.map(
        lambda m, p: p if m else np.zeros((1,), dtype=p.dtype),
        trainable_mask,
        params,
    )


def merge_restored_params(target: Any, restored: Any, trainable_mask: Any) -> Any:
    """Take trainable leaves from the restored tree, frozen from target."""
    return jax.tree.map(
        lambda m, t, r: r if m else t, trainable_mask, target, restored
    )


class CheckpointManager:
    def __init__(
        self,
        root_dir: str,
        monitors: Sequence[Dict] = DEFAULT_MONITORS,
        save_last: bool = True,
        save_at_steps: Sequence[int] = (),
        slim_mask: Any = None,  # params trainable mask -> exclude frozen
    ):
        self.root_dir = os.path.abspath(root_dir)
        self.monitors = list(monitors)
        self.save_last = save_last
        self.save_at_steps = set(save_at_steps)
        self.slim_mask = slim_mask
        self._ckptr = ocp.StandardCheckpointer()
        self._index_path = os.path.join(self.root_dir, "ckpt_index.json")
        self._index: Dict[str, List[Dict]] = {m["name"]: [] for m in self.monitors}
        os.makedirs(self.root_dir, exist_ok=True)
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index.update(json.load(f))

    # ------------------------------------------------------------------ save
    def _save_tree(self, path: str, state: Any, config: Optional[ConfigNode]):
        if os.path.exists(path):
            # A previous async save to this path may still be committing its
            # tmp dir — orbax stages to a sibling `<path>/state.orbax-…-tmp-*`
            # INSIDE this directory and only drains pending ops *inside*
            # save() (AsyncCheckpointer.save: get_temporary_path, THEN
            # wait_until_finished), i.e. after this rmtree would already have
            # deleted the in-flight tmp. Drain first.
            self._ckptr.wait_until_finished()
            shutil.rmtree(path)
        if self.slim_mask is not None:
            state = dataclasses.replace(
                state, params=strip_frozen_params(state.params, self.slim_mask)
            )
        self._ckptr.save(os.path.join(path, "state"), state)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {
                    "slim": self.slim_mask is not None,
                    # key shapes depend on the PRNG impl (threefry vs rbg);
                    # recorded so a toggle fails with a clear message
                    "prng_impl": str(jax.config.jax_default_prng_impl),
                },
                f,
            )
        if config is not None:
            with open(os.path.join(self.root_dir, "config.yaml"), "w") as f:
                f.write(config.to_yaml())

    def save(
        self,
        state: Any,
        step: int,
        metrics: Dict[str, float],
        config: Optional[ConfigNode] = None,
    ) -> List[str]:
        """Apply the monitor policy; returns the paths written."""
        written = []
        if self.save_last:
            path = os.path.join(self.root_dir, "last")
            self._save_tree(path, state, config)
            written.append(path)
        if step in self.save_at_steps:
            path = os.path.join(self.root_dir, f"step_{step}")
            self._save_tree(path, state, config)
            written.append(path)
        for mon in self.monitors:
            name, mode, top_k = mon["name"], mon["mode"], mon["top_k"]
            if name not in metrics:
                continue
            value = float(metrics[name])
            entries = self._index[name]
            better = sorted(
                entries + [{"step": step, "value": value}],
                key=lambda e: e["value"],
                reverse=(mode == "max"),
            )[:top_k]
            if {"step": step, "value": value} in better:
                fname = f"{name}_step{step}_{value:.4f}"
                path = os.path.join(self.root_dir, name, fname)
                self._save_tree(path, state, config)
                written.append(path)
                for stale in entries:
                    if stale not in better:
                        stale_path = os.path.join(
                            self.root_dir,
                            name,
                            f"{name}_step{stale['step']}_{stale['value']:.4f}",
                        )
                        shutil.rmtree(stale_path, ignore_errors=True)
                self._index[name] = better
        with open(self._index_path, "w") as f:
            json.dump(self._index, f)
        return written

    def wait(self):
        self._ckptr.wait_until_finished()

    # --------------------------------------------------------------- restore
    @staticmethod
    def read_meta(path: str) -> Dict:
        meta = os.path.join(path, "meta.json")
        if not os.path.exists(meta):
            return {}
        with open(meta) as f:
            return json.load(f)

    @classmethod
    def is_slim(cls, path: str) -> bool:
        return bool(cls.read_meta(path).get("slim"))

    def restore(self, path: str, target: Any) -> Any:
        """Restore into ``target``. For slim checkpoints, ``target`` must
        already carry the frozen tower weights (load_pretrained) — only the
        trainable leaves come from disk."""
        self.wait()
        saved_prng = self.read_meta(path).get("prng_impl")
        current_prng = str(jax.config.jax_default_prng_impl)
        if saved_prng and saved_prng != current_prng:
            raise ValueError(
                f"{path} was saved with PRNG impl {saved_prng!r} but the "
                f"current default is {current_prng!r} (trainer.fast_rng "
                "toggled?) — rng key shapes differ; restore with the same "
                "setting"
            )
        if self.is_slim(path):
            if self.slim_mask is None:
                raise ValueError(
                    f"{path} is a slim checkpoint (frozen towers excluded); "
                    "construct the CheckpointManager with slim_mask (set "
                    "trainer.checkpoint_frozen: false) to restore it"
                )
            slim_target = dataclasses.replace(
                target,
                params=strip_frozen_params(target.params, self.slim_mask),
            )
            restored = self._ckptr.restore(
                os.path.join(path, "state"), slim_target
            )
            return dataclasses.replace(
                restored,
                params=merge_restored_params(
                    target.params, restored.params, self.slim_mask
                ),
            )
        return self._ckptr.restore(os.path.join(path, "state"), target)

    def restore_last(self, target: Any) -> Any:
        return self.restore(os.path.join(self.root_dir, "last"), target)

    def best_path(self, monitor: str) -> Optional[str]:
        entries = self._index.get(monitor, [])
        if not entries:
            return None
        best = entries[0]
        return os.path.join(
            self.root_dir,
            monitor,
            f"{monitor}_step{best['step']}_{best['value']:.4f}",
        )


def load_config_from_checkpoint(ckpt_dir: str) -> ConfigNode:
    """Config rides beside the weights (save_hyperparameters equivalent)."""
    for cand in (
        os.path.join(ckpt_dir, "config.yaml"),
        os.path.join(os.path.dirname(ckpt_dir.rstrip("/")), "config.yaml"),
        os.path.join(
            os.path.dirname(os.path.dirname(ckpt_dir.rstrip("/"))), "config.yaml"
        ),
    ):
        if os.path.exists(cand):
            from ..config import load_config

            return load_config(cand)
    raise FileNotFoundError(f"no config.yaml found near {ckpt_dir}")


def load_any_checkpoint(ckpt_path: str):
    """(model, params, model_state) from EITHER an orbax run checkpoint or
    a reference Lightning ``.ckpt`` (converted on the fly) — the shared
    restore path of the export CLI and the jit serving backend. For orbax
    runs the PRNG impl the run used is configured first (trainer.fast_rng
    -> rbg; must happen before any key is created)."""
    from ..config import ConfigNode
    from ..models.speechclip import SpeechCLIPModel

    if str(ckpt_path).endswith(".ckpt"):
        from ..convert.reference_ckpt import load_reference_checkpoint

        params, model_state, config = load_reference_checkpoint(ckpt_path)
        model = SpeechCLIPModel(ConfigNode(config))
        return model, params, model_state or {}

    import jax

    config = load_config_from_checkpoint(ckpt_path)
    if config.get_path("trainer.fast_rng", False):
        jax.config.update("jax_default_prng_impl", "rbg")
    return restore_inference_state(config, ckpt_path)


def restore_inference_state(config: ConfigNode, ckpt_path: str):
    """(model, params, model_state) from a run checkpoint, WITHOUT the run
    machinery's side effects — no workdir/logger creation, no TB events
    (Trainer.__init__ writes into the experiment dir; read-only consumers
    like the export CLI must not). Handles the full restore contract: slim
    checkpoints get the frozen towers re-populated from the pretrained
    assets first (Trainer.prepare_restore_target semantics)."""
    import jax

    from ..models.speechclip import SpeechCLIPModel
    from .optim import build_optimizer
    from .train_step import create_train_state

    model = SpeechCLIPModel(config)
    params_shapes = jax.eval_shape(lambda: model.init(jax.random.key(0))[0])
    mask = model.trainable_mask(params_shapes)
    tx, _ = build_optimizer(config, mask)
    state = create_train_state(model, tx, jax.random.key(0))
    slim = not config.get_path("trainer.checkpoint_frozen", True)
    mgr = CheckpointManager(
        os.path.dirname(os.path.abspath(ckpt_path)),
        slim_mask=mask if (slim or CheckpointManager.is_slim(ckpt_path)) else None,
    )
    if CheckpointManager.is_slim(ckpt_path):
        state = dataclasses.replace(
            state, params=model.load_pretrained(state.params)
        )
    state = mgr.restore(ckpt_path, state)
    return model, state.params, state.model_state
