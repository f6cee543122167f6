"""CLI entry point: ``python main.py <config-name>``.

Parity with reference main.py:22-44: seeds RNGs, reads the YAML config,
builds the task, runs the epoch loop, and prints the final evaluation
scalars.
"""
from __future__ import annotations

import argparse
import random
import sys

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="TPU-native HyperGraphNets")
    parser.add_argument("config", help="config name under configs/ (e.g. minimal)")
    parser.add_argument("--data-dir", default=None, help="override data directory")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hyper_graph_nets_tpu.training.task import get_task
    from hyper_graph_nets_tpu.utils.config import read_yaml

    config = read_yaml(args.config)
    params = config.get("params", config)
    seed = params.get("random_seed", 0)
    random.seed(seed)
    np.random.seed(seed)

    task = get_task(config, data_dir=args.data_dir)
    task.run_iterations()
    scalars = task.get_scalars()
    for key, value in scalars.items():
        print(f"{key}: {value}")
    # a poisoned/empty data stream must not exit 0 (round-4 verdict #3):
    # NaN final scalars or no evaluation at all is a failed run
    bad = [
        k for k, v in scalars.items()
        if isinstance(v, (int, float, np.floating)) and not np.isfinite(v)
    ]
    if not scalars or bad:
        print(
            f"ERROR: run produced {'no scalars' if not scalars else 'non-finite scalars: ' + ', '.join(bad)}",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
