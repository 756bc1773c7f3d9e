"""Training CLI.

Reference entry point: `/root/reference/train.py:589-607` (absl + gin +
mp.spawn). Here: argparse + named experiment configs + dotted-path overrides;
one process drives all local devices through jit.

Usage:
  python -m rails_tpu.cli.train --config ml-1m-hstu-mol \
      [--set train.local_batch_size=64] [--workdir runs] \
      [--restore-from-ckpt PATH] [--num-epochs N]
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
import logging
import sys

from rails_tpu.core.config import (
    ExperimentConfig,
    get_experiment_config,
    list_experiment_configs,
)


def apply_override(cfg: ExperimentConfig, dotted: str, raw_value: str) -> ExperimentConfig:
    """Apply `section.field=value` (value parsed as a Python literal).

    `true`/`false` (any case) parse as booleans: the Python spellings are
    not the only ones users type, and the string "false" is truthy — a
    silent inversion for every `--set x=false` before this special case."""
    low = raw_value.strip().lower()
    if low in ("true", "false"):
        value = low == "true"
    else:
        try:
            value = ast.literal_eval(raw_value)
        except (ValueError, SyntaxError):
            value = raw_value
    parts = dotted.split(".")
    def rec(obj, path):
        if len(path) == 1:
            return dataclasses.replace(obj, **{path[0]: value})
        return dataclasses.replace(
            obj, **{path[0]: rec(getattr(obj, path[0]), path[1:])}
        )
    return rec(cfg, parts)


def parse_config(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--config", default=None,
        help=f"experiment name, one of {list_experiment_configs()}",
    )
    p.add_argument(
        "--gin-config-file", default=None,
        help="a reference .gin config file to import instead of --config "
        "(rails_tpu/compat/gin_import.py)",
    )
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="dotted config override, e.g. train.learning_rate=3e-4")
    p.add_argument("--workdir", default="runs")
    p.add_argument("--data-root", default=".")
    p.add_argument("--restore-from-ckpt", default=None)
    p.add_argument("--num-epochs", type=int, default=None)
    # Multi-host execution (one process per host; the reference's 2-process
    # DDP, `train.py:589-603`). On Cloud TPU pods, pass --distributed alone
    # (args auto-discovered); elsewhere give coordinator/count/id explicitly.
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (process 0's)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)
    if (args.config is None) == (args.gin_config_file is None):
        p.error("exactly one of --config / --gin-config-file is required")
    if args.gin_config_file is not None:
        from rails_tpu.compat.gin_import import experiment_config_from_gin

        result = experiment_config_from_gin(args.gin_config_file)
        for line in result.ignored:
            logging.info("gin import: ignored binding %s", line)
        cfg = result.config
    else:
        cfg = get_experiment_config(args.config)
    for ov in args.set:
        key, _, val = ov.partition("=")
        cfg = apply_override(cfg, key, val)
    args.cfg = cfg
    return args


def main(argv=None) -> None:
    logging.basicConfig(stream=sys.stdout, level=logging.INFO)
    args = parse_config(argv)
    if args.distributed or args.coordinator or (args.num_processes or 0) > 1:
        from rails_tpu.core import distributed

        if args.distributed and args.coordinator is None:
            distributed.initialize(auto_discover=True)  # TPU-pod metadata
        else:
            distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        logging.getLogger("rails_tpu").info(
            "multi-host: process %d/%d, %d global devices",
            distributed.process_index(), distributed.process_count(),
            __import__("jax").device_count(),
        )
    from rails_tpu.train.driver import run_training

    result = run_training(
        args.cfg,
        data_root=args.data_root,
        workdir=args.workdir,
        restore_from=args.restore_from_ckpt,
        num_epochs=args.num_epochs,
    )
    logging.getLogger("rails_tpu").info("final metrics: %s", result.final_metrics)


if __name__ == "__main__":
    main()
