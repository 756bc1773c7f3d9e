"""Multi-host execution scaffolding (opt-in).

Reference: the 2-process DDP driver (`/root/reference/train.py:589-603`) —
one process per GPU, NCCL rendezvous on localhost, `DistributedSampler` data
sharding (`/root/reference/trainer/data_loader.py:39-47`), and an explicit
all_reduce of [sum, numel] for metrics (`/root/reference/data/eval.py:271-275`).

TPU-native shape: one process PER HOST. `jax.distributed.initialize` performs
the rendezvous (DCN); a single global `Mesh` spans every device of every
host; the gradient all-reduce falls out of pjit sharding (riding ICI within a
slice, DCN across slices); per-host input sharding comes from
`Dataset.batches(num_shards=process_count(), shard_index=process_index())`;
eval metrics reduce with a process allgather of [sum, numel].
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
    auto_discover: bool = False,
) -> bool:
    """Connect this process to a multi-host run. No-op (returns False) when
    single-process. Must run before first jax device use.

    On Cloud TPU pods the arguments come from the metadata server: pass
    `auto_discover=True` with everything else None.
    """
    global _initialized
    if _initialized:
        return True
    explicit = auto_discover or coordinator_address is not None or (
        num_processes is not None and num_processes > 1
    )
    if not explicit:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns logging/checkpoints (reference rank 0,
    `train.py:317-323`)."""
    return jax.process_index() == 0


def make_global_batch(batch, mesh):
    """Assemble a globally data-sharded batch from each process's LOCAL batch.

    Each process contributes its `Dataset.batches(num_shards, shard_index)`
    slice; the returned jax.Arrays have global shape
    (local_batch * process_count, ...) sharded over the mesh `data` axis.
    Single-process, this reduces to `shard_batch`.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rails_tpu.core.mesh import batch_axes

    sh = NamedSharding(mesh, P(batch_axes(mesh)))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree_util.tree_map(put, batch)


def fetch_replicated(tree):
    """Host-fetch fully-replicated global arrays in a pytree.

    A global-mesh array can't join a process-local computation; after a
    multi-host train step the (replicated) params are pulled to host so each
    process can evaluate ITS OWN user shard independently (non-SPMD), with
    the metric reduction happening once at the end.
    """

    def f(x):
        if isinstance(x, jax.Array) and getattr(x, "is_fully_replicated", False):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(f, tree)


def all_reduce_mean_metrics(metrics: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Cross-process mean of per-example metric vectors.

    The reference all-reduces [sum, numel] per metric (`_avg`,
    `data/eval.py:271-275`); here one process allgather carries every metric's
    pair at once. Single-process, this is a plain mean.
    """
    if jax.process_count() == 1:
        return {
            k: float(np.mean(v)) if np.size(v) else float("nan")
            for k, v in metrics.items()
        }
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    local = np.array(
        [[float(np.sum(metrics[k])), float(np.size(metrics[k]))] for k in keys],
        np.float64,
    )
    gathered = np.asarray(multihost_utils.process_allgather(local))  # (P, K, 2)
    sums = gathered[..., 0].sum(axis=0)
    counts = gathered[..., 1].sum(axis=0)
    return {
        k: float(s / c) if c else float("nan")
        for k, s, c in zip(keys, sums, counts)
    }
