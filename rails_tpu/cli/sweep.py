"""Top-k algorithm sweep CLI (benchmark orchestrator).

Reference: `/root/reference/eval_batch.py:20-149` — per dataset, run
eval_from_checkpoint once per configured algorithm and collect the CSV tails.
Here the sweep runs in-process (one model build, shared corpus state), which
avoids the reference's per-algorithm subprocess + checkpoint reload.
"""

from __future__ import annotations

import argparse
import itertools
import logging
import sys
from typing import Dict, List

# Algorithm menus per dataset (`eval_batch.py:40-71`), extended with the
# TPU-native engines so the default protocol exercises them: the fused Pallas
# brute force (+ approx-select variant) and MoLIVFTopK — the FAISS IVFFlat
# replacement, mirroring the reference's `MoLNaiveFaissTopK5` slot
# (`eval_batch.py:23`).
CONFIGURED_ALGORITHMS: Dict[str, List[str]] = {
    "ml-1m": [
        "MoLBruteForceTopK",
        "MoLBruteForceTopKFused", "MoLBruteForceTopKFusedApprox",
        "MoLBruteForceTopKFusedInt8",
        "MoLNaiveTopK5", "MoLNaiveTopK10", "MoLNaiveTopK50", "MoLNaiveTopK100",
        "MoLAvgTopK200", "MoLAvgTopK500", "MoLAvgTopK1000",
        "MoLCombTopK5_200", "MoLCombTopK50_500", "MoLCombTopK100_1000",
        "MoLIVFTopK8", "MoLTileTopK8",
    ],
    "ml-20m": [
        "MoLBruteForceTopK",
        "MoLBruteForceTopKFused", "MoLBruteForceTopKFusedApprox",
        "MoLBruteForceTopKFusedInt8",
        "MoLNaiveTopK5", "MoLNaiveTopK10", "MoLNaiveTopK50", "MoLNaiveTopK100",
        "MoLAvgTopK200", "MoLAvgTopK500", "MoLAvgTopK1000", "MoLAvgTopK2000",
        "MoLCombTopK5_200", "MoLCombTopK50_500", "MoLCombTopK100_1000",
        "MoLIVFTopK16", "MoLTileTopK8",
    ],
    "amzn-books": [
        "MoLBruteForceTopK",
        "MoLBruteForceTopKFused", "MoLBruteForceTopKFusedApprox",
        "MoLBruteForceTopKFusedInt8",
        "MoLNaiveTopK5", "MoLNaiveTopK10", "MoLNaiveTopK50",
        "MoLAvgTopK500", "MoLAvgTopK1000", "MoLAvgTopK2000", "MoLAvgTopK4000",
        "MoLCombTopK5_200", "MoLCombTopK50_500", "MoLCombTopK100_1000",
        "MoLIVFTopK16", "MoLTileTopK8",
    ],
    "synthetic": [
        "MoLBruteForceTopK",
        "MoLBruteForceTopKFused",
        "MoLBruteForceTopKFusedInt8",
        "MoLNaiveTopK10", "MoLNaiveTopK50",
        "MoLAvgTopK200", "MoLAvgTopK500",
        "MoLCombTopK10_200",
        "MoLIVFTopK4", "MoLTileTopK4",
    ],
}


def run_sweep(
    cfg,
    ds,
    model,
    params,
    algorithms: List[str],
    eval_batches,
    k: int = 120,
    include_eval_time: bool = True,
    num_examples: int = None,
    item_parallel: int = 1,
) -> List[Dict[str, float]]:
    from rails_tpu.train import evaluation as ev

    t = cfg.train
    mesh = None
    if item_parallel > 1:
        from rails_tpu.core.config import MeshConfig
        from rails_tpu.core.mesh import make_mesh

        mesh = make_mesh(MeshConfig(item_parallel=item_parallel))
        logging.info("item-sharded sweep over mesh %s", dict(mesh.shape))
    exact_state = ev.get_eval_state(
        model, params, ds.all_item_ids, "MoLBruteForceTopK",
        item_l2_norm=t.item_l2_norm, l2_norm_eps=t.l2_norm_eps,
    )
    seq_len = eval_batches[0].features.ids.shape[1]
    rows = []
    for alg in algorithms:
        state = (
            exact_state if alg == "MoLBruteForceTopK"
            else ev.get_eval_state(
                model, params, ds.all_item_ids, alg,
                item_l2_norm=t.item_l2_norm, l2_norm_eps=t.l2_norm_eps,
            )
        )
        kk = min(k, len(ds.all_item_ids))
        step = None
        if mesh is not None:
            step = ev.make_sharded_eval_step(
                model, params, state, mesh,
                min(kk, 120) if include_eval_time else kk, seq_len=seq_len,
            )
        metrics, lat = ev.eval_metrics_from_batches(
            model, params, state, eval_batches,
            k=kk,
            include_eval_time=include_eval_time,
            timing_fraction=1.0 if include_eval_time else 0.0,
            num_examples=num_examples,
            step=step,
        )
        summary = ev.summarize_metrics(metrics)
        row = {"algorithm": alg, "hr@10": summary["hr@10"],
               "hr@50": summary["hr@50"], "ndcg@10": summary["ndcg@10"],
               "mrr": summary["mrr"]}
        if alg != "MoLBruteForceTopK":
            approx_step = None
            if mesh is not None:
                approx_step = ev.make_sharded_eval_step(
                    model, params, state, mesh, kk, seq_len=seq_len,
                )
            rec = ev.recall_vs_exact(
                model, params, exact_state, state, eval_batches,
                k=kk, approx_step=approx_step, num_examples=num_examples,
            )
            row.update(rec)
        if lat is not None:
            row["EvalTimeAvgMs"] = lat.mean_ms
            row["EvalTimeDevMs"] = lat.std_ms
        rows.append(row)
        logging.info("sweep %s: %s", alg, row)
    return rows


def main(argv=None) -> None:
    logging.basicConfig(stream=sys.stdout, level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument(
        "--gin-config-file", default=None,
        help="a reference .gin config file to import instead of --config",
    )
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--limit-users", type=int, default=8192)
    p.add_argument("--no-eval-time", action="store_true")
    p.add_argument("--data-root", default=".")
    p.add_argument("--output-csv", default=None)
    p.add_argument(
        "--item-parallel", type=int, default=1,
        help="shard the corpus over N mesh devices (distributed top-k merge)",
    )
    p.add_argument(
        "--extra-algorithms", nargs="*", default=[],
        help="append methods beyond the reference menu (e.g. "
        "MoLBruteForceTopKFused MoLIVFTopK16)",
    )
    p.add_argument(
        "--menu", default=None, choices=sorted(CONFIGURED_ALGORITHMS),
        help="use this dataset's algorithm menu regardless of the config's "
        "dataset (e.g. run the amzn-books menu on a synthetic corpus at "
        "Books scale)",
    )
    args = p.parse_args(argv)

    from rails_tpu.cli.train import apply_override
    from rails_tpu.core.config import get_experiment_config
    from rails_tpu.data.datasets import get_reco_dataset
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
    ds = get_reco_dataset(cfg.data, args.data_root)
    t = cfg.train
    n_eval = min(len(ds.eval_dataset), args.limit_users)
    eval_batches = list(
        itertools.islice(
            ds.eval_dataset.batches(
                batch_size=t.eval_batch_size,
                max_output_length=t.gr_output_length + 1,
                shuffle=False, drop_last=False,
            ),
            -(-n_eval // t.eval_batch_size),
        )
    )
    model, state, _, _ = create_train_state(
        cfg, ds.max_item_id, ds.all_item_ids, eval_batches[0]
    )
    if args.ckpt:
        state, _, _ = restore_checkpoint(args.ckpt, state)
    algorithms = CONFIGURED_ALGORITHMS.get(
        args.menu or cfg.data.dataset_name, CONFIGURED_ALGORITHMS["synthetic"]
    )
    # Budgets above the corpus size are meaningless (the algorithm clamps
    # and degenerates to brute force under an approximate label); drop such
    # entries for EVERY parsed method spelling.
    from rails_tpu.index.factory import parse_top_k_budgets

    x = len(ds.all_item_ids)
    algorithms = [
        a for a in algorithms
        if not any(
            v > x
            for key, v in parse_top_k_budgets(a).items()
            if key in ("avg_top_k", "k_per_group")
        )
    ]
    algorithms += [a for a in args.extra_algorithms if a not in algorithms]
    rows = run_sweep(
        cfg, ds, model, state.params, algorithms, eval_batches,
        include_eval_time=not args.no_eval_time,
        num_examples=n_eval,
        item_parallel=args.item_parallel,
    )
    cols = sorted({k for r in rows for k in r})
    lines = [",".join(cols)]
    for r in rows:
        lines.append(",".join(str(r.get(c, "")) for c in cols))
    out = "\n".join(lines)
    print(out)
    if args.output_csv:
        with open(args.output_csv, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
