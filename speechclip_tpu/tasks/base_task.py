"""Abstract task + shared CLI flags (reference avssl/task/base_task.py:17-32
+ avssl/util/args.py:4-38)."""

from __future__ import annotations

import argparse


class BaseTask:
    def __init__(self):
        self.args = None
        self.config = None

    def add_args(self, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        parser.add_argument("--config", type=str, default=None, help="config yaml")
        parser.add_argument("--save_path", type=str, default=None)
        parser.add_argument("--train", action="store_true")
        parser.add_argument("--eval", action="store_true")
        parser.add_argument("--test", action="store_true")
        parser.add_argument("--ckpt", type=str, default=None)
        parser.add_argument("--resume", type=str, default=None)
        parser.add_argument("--njobs", type=int, default=8)
        parser.add_argument("--seed", type=int, default=7122)
        parser.add_argument("--dataset_root", type=str, default=None)
        parser.add_argument("--log_level", type=str, default="INFO")
        parser.add_argument(
            "--override",
            nargs="*",
            default=[],
            help="config overrides: key.path=value",
        )
        parser.add_argument("--devices", type=int, default=None)
        parser.add_argument(
            "--platform",
            type=str,
            default=None,
            help="force a jax platform (e.g. cpu); must be handled before "
            "any backend use — this environment pins JAX_PLATFORMS in "
            "sitecustomize, so the env var alone is not sufficient",
        )
        return parser

    def parse_args(self, parser: argparse.ArgumentParser):
        self.args = parser.parse_args()
        return self.args

    def run(self):
        raise NotImplementedError
