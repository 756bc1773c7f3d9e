"""Export a rails_tpu Orbax checkpoint as a reference-format torch checkpoint.

    python -m rails_tpu.cli.export_checkpoint \
        --config ml-1m-hstu-mol --ckpt runs/<run>/ckpts/ep100 --out ref_ep100

writes a `torch.save` payload the reference implementation loads with
`load_state_dict(strict=True)` (`/root/reference/train.py:538-547` format,
DDP `module.` prefixes, causal-mask buffers reconstructed) — the inverse of
`cli/import_checkpoint.py`. Use it to validate or serve a TPU-trained model
inside the torch stack. Optimizer state is not exported (torch moments are
position-keyed; retrain or fine-tune restarts them).
"""

from __future__ import annotations

import argparse
import logging
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
    p.add_argument("--ckpt", required=True, help="Orbax ckpt path (ep* dir)")
    p.add_argument("--out", required=True, help="output torch checkpoint file")
    args = p.parse_args(argv)

    from rails_tpu.cli.train import apply_override
    from rails_tpu.compat.torch_export import export_torch_checkpoint
    from rails_tpu.core.config import get_experiment_config

    if (args.config is None) == (args.gin_config_file is None):
        p.error("exactly one of --config / --gin-config-file is required")
    if args.gin_config_file is not None:
        from rails_tpu.compat.gin_import import experiment_config_from_gin

        cfg = experiment_config_from_gin(args.gin_config_file).config
    else:
        cfg = get_experiment_config(args.config)
    for ov in args.set:
        key, _, val = ov.partition("=")
        cfg = apply_override(cfg, key, val)

    # Raw PyTree restore: params + epoch/batch_id only, no model needed.
    import orbax.checkpoint as ocp
    import os

    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.ckpt))
    export_torch_checkpoint(
        payload["params"], cfg, args.out,
        epoch=int(payload.get("epoch", 0)),
        batch_id=int(payload.get("batch_id", 0)),
    )
    logging.info("exported %s -> %s", args.ckpt, args.out)
    print(args.out)


if __name__ == "__main__":
    main()
