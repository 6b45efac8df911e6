"""Train/eval task for the SpeechCLIP model.

Equivalent of the reference TrainKWClip_GeneralTransformer +
TrainSpeechClipBaseTask.run (avssl/task/train_KWClip.py:71-100,
base_task.py:35-245): config assembly (fresh YAML, or from checkpoint for
--resume/--test with CLI overrides re-applied), dataset_root override,
trainer construction, fit/validate dispatch.

Checkpoint sources accepted by --resume/--ckpt:
- our orbax run dirs (config.yaml rides alongside);
- a reference Lightning .ckpt (converted on the fly,
  speechclip_tpu.convert.reference_ckpt).
"""

from __future__ import annotations

import logging

import jax

from ..config import ConfigNode, load_config
from ..training.checkpoint import load_config_from_checkpoint
from ..training.logging import set_logging
from ..training.trainer import Trainer
from .base_task import BaseTask

logger = logging.getLogger(__name__)


def _seed_everything(seed: int):
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)


def _build_tokenizer(config):
    try:
        from ..models.tokenizer import CLIPTokenizer

        return CLIPTokenizer()
    except FileNotFoundError:
        logger.warning(
            "CLIP BPE merges file not found (SPEECHCLIP_BPE_PATH); text "
            "tokenization and keyword diagnostics disabled"
        )
        return None


class TrainKWClip_GeneralTransformer(BaseTask):
    def run(self):
        args = self.args
        if getattr(args, "platform", None):
            jax.config.update("jax_platforms", args.platform)
        set_logging(args.log_level)
        _seed_everything(args.seed)

        ckpt_arg = args.resume or args.ckpt
        is_reference_ckpt = bool((ckpt_arg or "").endswith(".ckpt"))
        reference_state = None
        if ckpt_arg and is_reference_ckpt:
            from ..convert.reference_ckpt import load_reference_checkpoint

            params, model_state, config = load_reference_checkpoint(ckpt_arg)
            reference_state = (params, model_state)
            # CLI args are applied EXPLICITLY below (dataset_root, save_path,
            # seed, --override) — dumping vars(args) into the config here
            # would persist junk keys (train/eval/test flags, stale
            # ckpt/resume paths, njobs, ...) into the run's config.yaml
            config = ConfigNode(config)
            if args.config:  # explicit YAML wins over the pickled config
                config.merge_(load_config(args.config, overrides=args.override))
        elif args.resume:
            config = load_config_from_checkpoint(args.resume)
        else:
            assert args.config, "--config required for fresh runs"
            config = load_config(args.config, overrides=args.override)

        if args.dataset_root:
            config.set_path("data.dataset.dataset_root", args.dataset_root)
        if args.save_path:
            config.set_path("trainer.default_root_dir", args.save_path)
        config["seed"] = args.seed
        for ov in args.override:
            key, _, value = ov.partition("=")
            import yaml

            config.set_path(key.strip(), yaml.safe_load(value.strip()))

        if config.get_path("trainer.fast_rng", False):
            # rbg PRNG: dropout-mask generation is markedly cheaper than
            # threefry on TPU (measured 570 -> 547 ms/step at b256, same
            # loss). Must be set before any key is created. Default stays
            # threefry (JAX's reproducibility-across-versions default).
            jax.config.update("jax_default_prng_impl", "rbg")

        devices = None
        if args.devices:
            devices = jax.devices()[: args.devices]
        tokenizer = _build_tokenizer(config)
        trainer = Trainer(config, tokenizer=tokenizer, devices=devices)
        self.config = config

        if args.train:
            if reference_state is not None:
                # warm-start from the converted reference weights (fresh
                # optimizer state; Lightning optimizer state is torch-specific)
                params, model_state = reference_state
                trainer.fit(
                    initial_params=params, initial_model_state=model_state
                )
            else:
                trainer.fit(resume=args.resume)
        elif args.eval or args.test:
            from ..training.optim import build_optimizer
            from ..training.train_step import create_train_state, place_state

            state = create_train_state(
                trainer.model, trainer.tx, jax.random.key(args.seed)
            )
            if reference_state is not None:
                params, model_state = reference_state
                state = state.__class__(
                    params=params,
                    model_state=model_state or state.model_state,
                    opt_state=state.opt_state,
                    step=state.step,
                    rng=state.rng,
                )
            elif args.resume or args.ckpt:
                ckpt_path = args.resume or args.ckpt
                state = trainer.prepare_restore_target(ckpt_path, state)
                state = trainer.ckpt.restore(ckpt_path, state)
            state = place_state(state, trainer.mesh)
            # --test evaluates the test split, --eval the dev/val split
            # (reference avssl/task/base_task.py:108-110, 236-245)
            split = "test" if args.test else "dev"
            metrics = trainer.validate(state, split=split)
            logger.info("validation metrics (%s): %s", split, metrics)
            return metrics
        else:
            raise ValueError("specify one of --train / --eval / --test")
