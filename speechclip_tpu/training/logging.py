"""Metrics / observability.

Equivalent of the reference's util/log.py + Lightning log_dict wiring
(SURVEY.md §5): python logging setup, a metrics sink that always writes
JSONL (greppable, survives any backend), plus optional TensorBoard and
wandb backends selected by ``trainer.logger`` exactly like the reference's
logger factory (util/log.py:25-55). wandb is not installed in this image;
it degrades to a warning.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional


def set_logging(level: str = "INFO") -> None:
    # force=True: jax/absl may have installed root handlers already, which
    # would make a plain basicConfig a silent no-op
    logging.basicConfig(
        level=getattr(logging, str(level).upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        force=True,
    )


class MetricsLogger:
    def __init__(
        self,
        log_dir: str,
        backend: Optional[str] = "tb",
        project: Optional[str] = None,
        run_name: Optional[str] = None,
    ):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        self._wandb = None
        if backend in ("tb", "tensorboard"):
            try:
                # tensorflow's summary writer keeps torch out of the runtime
                # (architecture invariant: torch only in convert/ and tests)
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(log_dir, "tb")
                )
            except Exception as e:  # pragma: no cover
                logging.getLogger(__name__).warning("tensorboard unavailable: %s", e)
        elif backend == "wandb":
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project or "speechclip_tpu", name=run_name, dir=log_dir
                )
            except Exception as e:
                logging.getLogger(__name__).warning(
                    "wandb unavailable (%s); falling back to jsonl only", e
                )

    def log(self, metrics: Dict[str, float], step: int) -> None:
        flat = {}
        for k, v in metrics.items():
            if isinstance(v, dict):
                for kk, vv in v.items():
                    flat[f"{k}/{kk}"] = float(vv)
            else:
                try:
                    flat[k] = float(v)
                except (TypeError, ValueError):
                    continue
        record = {"step": int(step), "time": time.time(), **flat}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in flat.items():
                    tf.summary.scalar(k, v, step=step)
        if self._wandb is not None:
            self._wandb.log(flat, step=step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()  # tf.summary writer supports close()
        if self._wandb is not None:
            self._wandb.finish()
