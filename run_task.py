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

    runner = getattr(tasks, args.task)()
    task_parser = argparse.ArgumentParser()
    task_parser.add_argument("task", type=str)
    runner.add_args(task_parser)
    runner.parse_args(task_parser)
    runner.run()


if __name__ == "__main__":
    main()
