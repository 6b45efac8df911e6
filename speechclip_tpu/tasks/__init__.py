"""Task layer: CLI argument handling + train/eval dispatch.

Equivalent of the reference task layer (avssl/task/base_task.py:17-245,
train_KWClip.py:71-100): a task parses the shared flags
(--config --save_path --train --eval --test --ckpt --resume --seed
--dataset_root --log_level, util/args.py:4-38), assembles the config
(YAML + CLI, or from-checkpoint for --resume/--test), builds the Trainer
and dispatches fit/validate.
"""

from .base_task import BaseTask
from .train_kwclip import TrainKWClip_GeneralTransformer

__all__ = ["BaseTask", "TrainKWClip_GeneralTransformer"]
