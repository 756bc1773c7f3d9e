"""Full training driver: epochs, periodic eval, checkpointing, logging.

Reference: `train_fn` (`/root/reference/train.py:109-571`). One process drives
all local devices through a single jit (no mp.spawn / DDP); per-epoch eval
truncates to `partial_eval_num_iters` batches except every
`full_eval_every_n`-th epoch (`train.py:465-535`).

Divergence: the reference also runs a mid-epoch eval every `eval_interval`
steps on the current train batch (`train.py:353-390`), which rebuilds the
full corpus index each time; here `eval_interval` paces train-metric logging
and quality is measured by the per-epoch eval (one compiled eval step reused
across epochs).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import numpy as np

from rails_tpu.core import distributed as dist
from rails_tpu.core.config import ExperimentConfig
from rails_tpu.core.mesh import make_mesh, replicate, shard_batch
from rails_tpu.data.datasets import RecoDataset, get_reco_dataset
from rails_tpu.train import evaluation as ev
from rails_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from rails_tpu.train.loop import TrainState, create_train_state
from rails_tpu.train.metrics import MetricsWriter

logger = logging.getLogger("rails_tpu")


@dataclass
class TrainResult:
    state: TrainState
    final_metrics: Dict[str, float]
    model: object


def run_training(
    cfg: ExperimentConfig,
    data_root: str = ".",
    workdir: Optional[str] = None,
    restore_from: Optional[str] = None,
    use_mesh: bool = True,
    dataset: Optional[RecoDataset] = None,
    num_epochs: Optional[int] = None,
    item_id_to_category_id: Optional[np.ndarray] = None,
) -> TrainResult:
    t = cfg.train
    ds = dataset or get_reco_dataset(cfg.data, data_root)
    max_output_length = t.gr_output_length + 1

    sample_batch = next(
        ds.train_dataset.batches(
            batch_size=t.local_batch_size,
            max_output_length=max_output_length,
            shuffle=False,
        )
    )
    model, state, train_step, sampler = create_train_state(
        cfg, ds.max_item_id, ds.all_item_ids, sample_batch,
        item_id_to_category_id=item_id_to_category_id,
    )

    # Multi-host: one process per host (`jax.distributed.initialize` must
    # have run before this, e.g. via cli/train --coordinator). The mesh spans
    # every device of every process; each process feeds its own data shard.
    n_proc = dist.process_count()
    mesh = None
    if (use_mesh and jax.device_count() > 1) or n_proc > 1:
        mesh = make_mesh(cfg.mesh)
        state = replicate(state, mesh)
        logger.info(
            "training over mesh %s (%d process(es))", dict(mesh.shape), n_proc
        )

    def place(batch):
        if n_proc > 1:
            return dist.make_global_batch(batch, mesh)
        return shard_batch(batch, mesh) if mesh is not None else batch

    run_name = f"{cfg.name}-{cfg.config_hash()}"
    log_dir = os.path.join(workdir, run_name) if workdir else None
    ckpt_dir = os.path.join(workdir, run_name, "ckpts") if workdir else None
    # Primary-only writer (the reference creates its SummaryWriter on rank 0
    # only, `train.py:317-323`): non-primary processes would otherwise open
    # stray metrics.jsonl / TB event files in a shared run dir.
    writer = MetricsWriter(log_dir if dist.is_primary() else None)
    if ckpt_dir:
        os.makedirs(ckpt_dir, exist_ok=True)

    epoch0 = 0
    batch_id = 0
    if restore_from:
        state, prev_epoch, prev_batch_id = restore_checkpoint(
            restore_from, state
        )
        epoch0 = prev_epoch + 1
        # Continue the run's true batch counter so the metric step axis and
        # subsequent checkpoints don't restart from 0 (`train.py:325-334`).
        batch_id = prev_batch_id
        if mesh is not None:
            state = replicate(state, mesh)
        logger.info("restored %s; resuming at epoch %d", restore_from, epoch0)

    rng = jax.random.PRNGKey(t.random_seed)
    epochs = num_epochs if num_epochs is not None else t.num_epochs
    final_metrics: Dict[str, float] = {}
    last_log = time.time()
    eval_k = min(2500, len(ds.all_item_ids))
    # One compiled eval step reused across epochs (the per-epoch corpus
    # re-embedding only changes table VALUES, not shapes).
    eval_step_fn = ev.make_eval_step_fn(
        model, t.top_k_method, eval_k, len(ds.all_item_ids),
    )

    from rails_tpu.data.datasets import prefetch_batches

    for epoch in range(epoch0, epochs):
        for batch in prefetch_batches(
            ds.train_dataset.batches(
                batch_size=t.local_batch_size,
                max_output_length=max_output_length,
                shuffle=True,
                seed=t.random_seed + epoch,
                drop_last=True,
                # Per-process input sharding (the reference's
                # DistributedSampler, `trainer/data_loader.py:39-47`).
                num_shards=n_proc,
                shard_index=dist.process_index(),
            )
        ):
            batch = place(batch)
            state, metrics = train_step(state, batch, rng)
            if (batch_id % t.eval_interval) == 0 and dist.is_primary():
                m = {k: float(v) for k, v in metrics.items()}
                writer.write(batch_id, m, prefix="train")
                logger.info(
                    "epoch %d batch %d (%.2fs): loss %.6f",
                    epoch, batch_id, time.time() - last_log, m["loss"],
                )
                last_log = time.time()
            batch_id += 1

        # Per-epoch eval (`train.py:465-535`). Multi-host: params are pulled
        # to host (fully replicated) so each process evaluates its own user
        # shard as an independent local computation.
        is_full = (epoch % t.full_eval_every_n) == 0
        eval_params = (
            dist.fetch_replicated(state.params) if n_proc > 1 else state.params
        )
        eval_state = ev.get_eval_state(
            model, eval_params, ds.all_item_ids, t.top_k_method,
            item_l2_norm=t.item_l2_norm, l2_norm_eps=t.l2_norm_eps,
        )
        # Full evals cover EVERY user exactly once (wrap-around tail batch,
        # duplicates trimmed via num_examples — `data/eval.py:131-138`);
        # partial evals sample a shuffled prefix of full batches.
        # drop_last=False for partial evals too: a small per-process user
        # shard could otherwise yield ZERO batches on one host, and the
        # cross-process metric allgather would see mismatched shapes (the
        # wrap-around tail keeps every shard's batches fixed-shape anyway).
        eval_batches = ds.eval_dataset.batches(
            batch_size=t.eval_batch_size,
            max_output_length=max_output_length,
            shuffle=True,
            seed=t.random_seed + epoch,
            drop_last=False,
            num_shards=n_proc,
            shard_index=dist.process_index(),
        )
        # This process's user-shard size; summarize_metrics all-reduces the
        # [sum, numel] pairs so the global mean covers every user once.
        n_eval = (
            len(range(dist.process_index(), len(ds.eval_dataset), n_proc))
            if is_full else None
        )
        if not is_full:
            limited = []
            for i, b in enumerate(eval_batches):
                if i >= t.partial_eval_num_iters:
                    break
                limited.append(b)
            eval_batches = limited
        # Single-host multi-device: shard eval batches over the data axis
        # (otherwise the replicated-params + host-array program computes the
        # full batch identically on every device). Multi-host eval stays a
        # per-process local computation on the host-fetched params.
        if (
            n_proc == 1 and mesh is not None
            and t.eval_batch_size % mesh.shape.get("data", 1) == 0
        ):
            eval_batches = (shard_batch(b, mesh) for b in eval_batches)
        metrics_arrays, _ = ev.eval_metrics_from_batches(
            model, eval_params, eval_state, eval_batches,
            k=eval_k, step_fn=eval_step_fn, num_examples=n_eval,
        )
        summary = ev.summarize_metrics(metrics_arrays)
        final_metrics = summary
        if dist.is_primary():
            writer.write(epoch, summary, prefix="eval_epoch")
            logger.info(
                "eval @ epoch %d: NDCG@10 %.4f HR@10 %.4f HR@50 %.4f MRR %.4f",
                epoch, summary.get("ndcg@10", float("nan")),
                summary.get("hr@10", float("nan")),
                summary.get("hr@50", float("nan")),
                summary.get("mrr", float("nan")),
            )
        # Checkpoint saves are collective (orbax barriers internally); every
        # process calls, orbax writes from the primary.
        if ckpt_dir and epoch > 0 and (epoch % t.save_ckpt_every_n) == 0:
            save_checkpoint(
                ckpt_dir, state, epoch, batch_id,
                config_json=cfg.to_json(), debug_str=cfg.model_debug_str(),
            )

    if ckpt_dir:
        save_checkpoint(
            ckpt_dir, state, epochs - 1 if epochs else 0, batch_id,
            config_json=cfg.to_json(), debug_str=cfg.model_debug_str(),
        )
    writer.close()
    return TrainResult(state=state, final_metrics=final_metrics, model=model)
