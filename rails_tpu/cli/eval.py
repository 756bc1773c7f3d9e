"""Checkpoint evaluation / retrieval benchmark CLI.

Reference: `/root/reference/eval_from_checkpoint.py:107-578`. Rebuilds the
model from config, restores a checkpoint, and evaluates a chosen top-k method
over the eval split — optionally measuring per-call retrieval latency and/or
recall against exact brute-force MoL (`--eval-against-brute-force`,
`eval_from_checkpoint.py:427-449`). Emits the same machine-parseable CSV
tail: a header line and a value line.
"""

from __future__ import annotations

import argparse
import ast
import itertools
import logging
import sys

import numpy as np


def main(argv=None) -> None:
    logging.basicConfig(stream=sys.stdout, level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument(
        "--gin-config-file", default=None,
        help="a reference .gin config file to import instead of --config",
    )
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    p.add_argument("--ckpt", default=None, help="checkpoint path (ep* dir)")
    p.add_argument("--top-k-method", default=None)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--include-eval-time", action="store_true")
    p.add_argument("--eval-against-brute-force", action="store_true")
    p.add_argument("--limit-users", type=int, default=None)
    p.add_argument("--data-root", default=".")
    p.add_argument(
        "--item-parallel", type=int, default=1,
        help="shard the corpus over N mesh devices (distributed top-k merge)",
    )
    p.add_argument(
        "--save-serving-state", default=None, metavar="DIR",
        help="persist the built corpus tables (Orbax) for fast server "
        "cold starts via --load-serving-state",
    )
    p.add_argument(
        "--load-serving-state", default=None, metavar="DIR",
        help="restore precomputed corpus tables instead of re-embedding "
        "the corpus (rails_tpu/index/serving_state.py)",
    )
    p.add_argument(
        "--sort-by-length", action="store_true",
        help="length-sorted batches truncated to their own padded max "
        "(multiple of 64) — the dense counterpart of the reference's "
        "jagged padding skip; metrics are unchanged, encode is faster",
    )
    args = p.parse_args(argv)

    from rails_tpu.cli.train import apply_override
    from rails_tpu.core.config import get_experiment_config
    from rails_tpu.data.datasets import get_reco_dataset
    from rails_tpu.train import evaluation as ev
    from rails_tpu.train.checkpoint import restore_checkpoint
    from rails_tpu.train.loop import create_train_state

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
    t = cfg.train
    top_k_method = args.top_k_method or t.top_k_method

    ds = get_reco_dataset(cfg.data, args.data_root)
    max_output_length = t.gr_output_length + 1
    # Every user is evaluated exactly once: the tail batch wraps around for
    # fixed shapes and `num_examples` trims the duplicate rows
    # (reference evaluates every user, `data/eval.py:131-138`).
    n_eval = len(ds.eval_dataset)
    if args.limit_users:
        n_eval = min(n_eval, args.limit_users)
    n_batches = -(-n_eval // t.eval_batch_size)
    eval_batches = list(
        itertools.islice(
            ds.eval_dataset.batches(
                batch_size=t.eval_batch_size,
                max_output_length=max_output_length,
                shuffle=False,
                drop_last=False,
                sort_by_length=args.sort_by_length,
            ),
            n_batches,
        )
    )
    sample = eval_batches[0]        # pre-truncation shapes for model init
    if args.sort_by_length:
        if args.item_parallel != 1:
            p.error(
                "--sort-by-length with --item-parallel is not supported yet "
                "(the sharded step compiles for one sequence length)"
            )
        if args.limit_users:
            p.error(
                "--sort-by-length with --limit-users would evaluate the N "
                "SHORTEST-history users instead of the first N — drop one "
                "of the flags"
            )
        from rails_tpu.data.features import (
            serving_pad_length, truncate_features,
        )

        n_full = eval_batches[0].features.ids.shape[1]
        eval_batches = [
            b._replace(
                features=truncate_features(
                    b.features,
                    min(n_full,
                        serving_pad_length(int(b.features.lengths.max()), 64)),
                )
            )
            for b in eval_batches
        ]
    model, state, _, _ = create_train_state(
        cfg, ds.max_item_id, ds.all_item_ids, sample
    )
    if args.ckpt:
        state, epoch, _ = restore_checkpoint(args.ckpt, state)
        logging.info("restored checkpoint %s (epoch %d)", args.ckpt, epoch)
    params = state.params

    if args.load_serving_state:
        from rails_tpu.index.serving_state import load_serving_state

        eval_state = load_serving_state(args.load_serving_state, model, params)
        if eval_state.num_objects != len(ds.all_item_ids):
            raise SystemExit(
                f"serving state holds {eval_state.num_objects} items but the "
                f"dataset has {len(ds.all_item_ids)} — the state was saved "
                "for a different corpus/config"
            )
        if eval_state.top_k_method != top_k_method:
            logging.info(
                "serving state was saved for %s; using it (requested %s)",
                eval_state.top_k_method, top_k_method,
            )
            top_k_method = eval_state.top_k_method
    else:
        eval_state = ev.get_eval_state(
            model, params, ds.all_item_ids, top_k_method,
            item_l2_norm=t.item_l2_norm, l2_norm_eps=t.l2_norm_eps,
        )
    if args.save_serving_state:
        from rails_tpu.index.serving_state import save_serving_state

        out_path = save_serving_state(args.save_serving_state, eval_state)
        logging.info("serving state saved to %s", out_path)
    k = min(args.k if not args.include_eval_time else 120, len(ds.all_item_ids))

    mesh = None
    step = None
    if args.item_parallel > 1:
        import jax
        from rails_tpu.core.config import MeshConfig
        from rails_tpu.core.mesh import make_mesh

        if jax.device_count() < args.item_parallel:
            p.error(
                f"--item-parallel {args.item_parallel} needs that many "
                f"devices (have {jax.device_count()})"
            )
        mesh = make_mesh(MeshConfig(item_parallel=args.item_parallel))
        step = ev.make_sharded_eval_step(
            model, params, eval_state, mesh, k,
            seq_len=sample.features.ids.shape[1],
        )
        logging.info("item-sharded retrieval over mesh %s", dict(mesh.shape))
    metrics, lat = ev.eval_metrics_from_batches(
        model, params, eval_state, eval_batches,
        k=k,
        include_eval_time=args.include_eval_time,
        num_examples=n_eval,
        step=step,
    )
    summary = ev.summarize_metrics(metrics)

    recall = {}
    # The exactness oracle matches the similarity: exact MoL for MoL
    # models, exact MIPS for dot-product models (the reference's
    # `--eval_against_brute_force` does the same per-config,
    # `eval_from_checkpoint.py:395-421`).
    oracle = (
        "MoLBruteForceTopK" if cfg.similarity_type == "MoL"
        else "MIPSBruteForceTopK"
    )
    if args.eval_against_brute_force and top_k_method != oracle:
        exact_state = ev.get_eval_state(
            model, params, ds.all_item_ids, oracle,
            item_l2_norm=t.item_l2_norm, l2_norm_eps=t.l2_norm_eps,
        )
        recall_k = min(200, len(ds.all_item_ids))
        approx_step = None
        if mesh is not None:
            approx_step = ev.make_sharded_eval_step(
                model, params, eval_state, mesh, recall_k,
                seq_len=sample.features.ids.shape[1],
            )
        recall = ev.recall_vs_exact(
            model, params, exact_state, eval_state, eval_batches,
            k=recall_k, approx_step=approx_step, num_examples=n_eval,
        )
        summary.update(recall)

    keys = ["ndcg@10", "hr@10", "hr@50", "hr@100", "hr@200", "mrr"]
    keys += sorted(recall)
    if lat is not None:
        summary["EvalTimeAvgMs"] = lat.mean_ms
        summary["EvalTimeDevMs"] = lat.std_ms
        keys += ["EvalTimeAvgMs", "EvalTimeDevMs"]
    print(",".join([f"{top_k_method}_{k}" for k in keys]))
    print(",".join(f"{summary.get(k, float('nan')):.4f}" for k in keys))


if __name__ == "__main__":
    main()
