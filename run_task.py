#!/usr/bin/env python3
"""CLI dispatcher (reference run_task.py:11-21 contract):

  python3 run_task.py TrainKWClip_GeneralTransformer --config <yaml> --train
"""

import argparse


def main():
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("task", type=str, help="task class name")
    args, _ = parser.parse_known_args()

    from speechclip_tpu import tasks

    runner_cls = getattr(tasks, args.task, None)
    if runner_cls is None:
        # the task name must be the FIRST argument (reference contract);
        # with flags first, argparse binds a flag's value to the `task`
        # positional (e.g. `--config cfg.yaml Task` -> task='cfg.yaml') —
        # fail with usage instead of an AttributeError on a yaml path
        valid = ", ".join(
            n for n in tasks.__all__ if n != "BaseTask"
        )
        parser.error(
            f"unknown task {args.task!r} — the task name must come first: "
            f"run_task.py TASK [--flags]; available tasks: {valid}"
        )
    runner = runner_cls()
    task_parser = argparse.ArgumentParser()
    task_parser.add_argument("task", type=str)
    runner.add_args(task_parser)
    runner.parse_args(task_parser)
    runner.run()


if __name__ == "__main__":
    main()
