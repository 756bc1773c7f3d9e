"""Convert a reference (torch) checkpoint into a rails_tpu Orbax checkpoint.

    python -m rails_tpu.cli.import_checkpoint \
        --config ml-1m-hstu-mol --ckpt /path/to/..._ep100 --out runs/imported

writes `<out>/ckpts/ep<epoch>` restorable by `cli/eval.py --ckpt` and
`cli/train.py --restore-from-ckpt`. The reference's AdamW moments are
imported too when present, so training resumes exactly mid-schedule; pass
`--skip-optimizer` for fresh moments (what the reference's own eval driver
uses, `eval_from_checkpoint.py:366-377`). A reference `.gin` config file
can stand in for the registry name via `--gin-config-file`.

Reference checkpoint format: `/root/reference/train.py:538-547`
(torch.save of {epoch, batch_id, model_state_dict, optimizer_state_dict},
DDP `module.` prefixes, legacy `_item_proj_module` layouts handled).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def main(argv=None) -> None:
    logging.basicConfig(stream=sys.stdout, level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument(
        "--gin-config-file", default=None,
        help="a reference .gin config file to import instead of --config",
    )
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    p.add_argument("--ckpt", required=True, help="reference torch checkpoint")
    p.add_argument("--out", required=True, help="output run directory")
    p.add_argument(
        "--num-items", type=int, default=None,
        help="max item id (default: inferred from the embedding table)",
    )
    p.add_argument(
        "--no-strict", action="store_true",
        help="ignore reference keys the conversion does not consume",
    )
    p.add_argument(
        "--skip-optimizer", action="store_true",
        help="do not import AdamW moments even when the checkpoint has them "
        "(training then resumes with fresh moments)",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rails_tpu.cli.train import apply_override
    from rails_tpu.compat.torch_import import (
        import_torch_checkpoint,
        import_torch_checkpoint_full,
    )
    from rails_tpu.core.config import get_experiment_config
    from rails_tpu.train.checkpoint import save_checkpoint
    from rails_tpu.train.loop import TrainState, make_optimizer

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

    optimizer = make_optimizer(cfg)
    if args.skip_optimizer:
        params, epoch, batch_id = import_torch_checkpoint(
            args.ckpt, cfg, num_items=args.num_items,
            strict=not args.no_strict,
        )
        params = jax.tree_util.tree_map(jnp.asarray, params)
        opt_state, step = optimizer.init(params), 0
    else:
        params, opt_state, step, epoch, batch_id = import_torch_checkpoint_full(
            args.ckpt, cfg, optimizer, num_items=args.num_items,
            strict=not args.no_strict,
        )
        params = jax.tree_util.tree_map(jnp.asarray, params)
        if step:
            logging.info("imported AdamW moments at step %d", step)
    state = TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.asarray(step, jnp.int32),
    )
    ckpt_dir = os.path.join(args.out, "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    path = save_checkpoint(
        ckpt_dir, state, epoch=epoch, batch_id=batch_id,
        config_json=cfg.to_json(),
        debug_str=f"imported from {os.path.abspath(args.ckpt)}",
    )
    logging.info("imported %s (epoch %d) -> %s", args.ckpt, epoch, path)
    print(path)


if __name__ == "__main__":
    main()
